"""Lane-padded head fast path: parity with the unpadded reference pipeline.

The padded path (models/head.py pad_head_level_params / padded_call,
ops/nms.py _single_image_nms_padded) reorganizes the TPU cost model — free
tiled flatten, masked stage-1 reductions, arithmetic anchor properties,
payload-carried boxes — but must stay functionally identical to the
two-stage lazy-decode postprocess (reference semantics:
yolort/models/box_head.py:388-429).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from yolort_tpu.models.head import (
    PAD_LOGIT,
    YOLOHead,
    anchor_props_from_index,
    anchor_tables,
    pad_head_level_params,
    padded_num_outputs,
)
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.ops.nms import select_topk_threshold


def test_padded_num_outputs():
    assert padded_num_outputs(85) == 128
    assert padded_num_outputs(128) == 128
    assert padded_num_outputs(17) == 128
    assert padded_num_outputs(130) == 256


@pytest.mark.parametrize("use_p6", [False, True])
def test_anchor_props_from_index_matches_tables(use_p6):
    """Index arithmetic must be bit-identical to gathering anchor_tables."""
    from yolort_tpu.models.head import (
        DEFAULT_ANCHOR_GRIDS,
        DEFAULT_STRIDES,
        P6_ANCHOR_GRIDS,
        P6_STRIDES,
    )

    strides = P6_STRIDES if use_p6 else DEFAULT_STRIDES
    ags = P6_ANCHOR_GRIDS if use_p6 else DEFAULT_ANCHOR_GRIDS
    grid_sizes = [(64 // s, 48 // s) for s in strides]
    grid, shift, stride = anchor_tables(grid_sizes, strides, ags)
    na = grid.shape[0]
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, na, size=(97,)), jnp.int32)
    g, s, st = anchor_props_from_index(idx, grid_sizes, strides, ags)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(grid[idx]))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(shift[idx]))
    np.testing.assert_array_equal(np.asarray(st), np.asarray(stride[idx]))


def test_padded_call_matches_call():
    """padded_call lanes [:K] == __call__ output; pad lanes == PAD_LOGIT."""
    head = YOLOHead((32, 64, 128), 3, (8, 16, 32), 12)
    p = head.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    feats = [
        jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 4, 4, 64)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, 2, 128)), jnp.float32),
    ]
    ref = head(p, feats)
    pad = head.padded_call(p, feats)
    K = head.num_outputs
    kp = padded_num_outputs(K)
    for r, q in zip(ref, pad):
        n, h, w, _ = r.shape
        q5 = np.asarray(q).reshape(n, h, w, 3, kp)
        r5 = np.asarray(r).reshape(n, h, w, 3, K)
        # not bit-exact: the wider A*kp output changes XLA's contraction
        # codegen (FMA order), observed 1-ulp drift on CPU
        np.testing.assert_allclose(q5[..., :K], r5, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(q5[..., K:], PAD_LOGIT)


def test_pad_head_level_params_rejects_int8_output_scale():
    p = {"wq": jnp.zeros((1, 1, 8, 3 * 17), jnp.int8),
         "ws": jnp.ones((3 * 17,), jnp.float32),
         "xs": jnp.float32(1.0),
         "os": jnp.float32(1.0),
         "b": jnp.zeros((3 * 17,), jnp.float32)}
    with pytest.raises(ValueError):
        pad_head_level_params(p, 3, 17, 128)


@pytest.mark.parametrize("w,n_chunks", [(16, 32), (12, 7)])
def test_select_topk_payload_rides_chunk_gather(w, n_chunks):
    """payload rows returned per selected slot must equal payload[idx // w],
    and (values, indices) must be unchanged vs the payload-free call."""
    rng = np.random.default_rng(2)
    flat = jnp.asarray(rng.normal(size=(w * n_chunks,)), jnp.float32)
    payload = jnp.asarray(
        np.stack([np.arange(n_chunks, dtype=np.float32) * 10 + j for j in range(4)], 1)
    )
    k = 24
    v0, i0 = select_topk_threshold(flat, k, 0.1, w=w)
    v1, i1, pay = select_topk_threshold(flat, k, 0.1, w=w, payload=payload)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    valid = np.asarray(v1) > 0.1
    expect = np.asarray(payload)[np.asarray(i1)[valid] // w]
    np.testing.assert_array_equal(np.asarray(pay)[valid], expect)


def test_select_topk_payload_shape_validation():
    flat = jnp.zeros((40,), jnp.float32)
    with pytest.raises(ValueError):
        select_topk_threshold(flat, 4, 0.0, w=16, payload=jnp.zeros((2, 4)))
    with pytest.raises(ValueError):
        select_topk_threshold(flat, 4, 0.0, w=16, payload=jnp.zeros((3, 4)))


def _canon(det, i):
    """Detections row set for image i, sorted canonically for comparison."""
    n = int(det.num[i])
    rows = np.concatenate(
        [
            np.asarray(det.scores[i][:n])[:, None],
            np.asarray(det.labels[i][:n])[:, None].astype(np.float32),
            np.asarray(det.boxes[i][:n]),
        ],
        axis=1,
    )
    order = np.lexsort(rows.T[::-1])
    return rows[order]


@pytest.mark.parametrize("pre_nms_anchors", [None, 64])
def test_padded_postprocess_parity(pre_nms_anchors):
    """Full-model forward: head_pad=True must produce the identical
    detection set as the unpadded two-stage path (same params, same image)."""
    model = build_yolo(
        "yolov5_darknet_pan_n_r60",
        num_classes=12,
        pre_nms_topk=256,
        nms_tile_size=64,
        score_thresh=0.01,
    )
    model = replace(model, pre_nms_anchors=pre_nms_anchors)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    # random-init obj biases are ~log(8/H*W) — nothing clears score_thresh.
    # Lift objectness and spread class logits so a real detection set exists.
    K = model.head.num_outputs
    for lvl, p in params["head"].items():
        b = np.array(p["b"]).reshape(model.num_anchors, K)
        b[:, 4] += 5.0
        b[:, 5:] += rng.normal(0, 2.0, size=b[:, 5:].shape)
        params["head"][lvl] = dict(p, b=jnp.asarray(b.reshape(-1)))
    images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)), jnp.float32)

    det_ref = replace(model, head_pad=False)(params, images)
    det_pad = replace(model, head_pad=True)(params, images)

    for i in range(images.shape[0]):
        assert int(det_ref.num[i]) == int(det_pad.num[i])
        a, b = _canon(det_ref, i), _canon(det_pad, i)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
    # the comparison must not be vacuous
    assert int(np.asarray(det_ref.num).sum()) > 0


@pytest.mark.parametrize("arith,payload", [(True, False), (False, True), (True, True)])
def test_gather_elimination_toggles_parity(arith, payload):
    """anchor_arith / payload_boxes must not change the detection set vs the
    gather-based defaults (topk_impl pinned to bisect so payload engages)."""
    from yolort_tpu.ops.nms import batched_postprocess_from_heads

    model = build_yolo(
        "yolov5_darknet_pan_n_r60",
        num_classes=12,
        pre_nms_topk=256,
        nms_tile_size=64,
        score_thresh=0.01,
    )
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    K = model.head.num_outputs
    for lvl, p in params["head"].items():
        b = np.array(p["b"]).reshape(model.num_anchors, K)
        b[:, 4] += 5.0
        b[:, 5:] += rng.normal(0, 2.0, size=b[:, 5:].shape)
        params["head"][lvl] = dict(p, b=jnp.asarray(b.reshape(-1)))
    images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)), jnp.float32)
    outs = model.head_outputs(params, images)

    def post(a, p):
        return batched_postprocess_from_heads(
            outs, model.strides, model.anchor_grids,
            num_classes=model.num_classes, score_thresh=0.01,
            pre_nms_topk=256, nms_tile_size=64, topk_impl="bisect",
            anchor_arith=a, payload_boxes=p,
        )

    det_ref = post(False, False)
    det_new = post(arith, payload)
    for i in range(images.shape[0]):
        assert int(det_ref.num[i]) == int(det_new.num[i])
        np.testing.assert_allclose(
            _canon(det_ref, i), _canon(det_new, i), rtol=0, atol=1e-5
        )
    assert int(np.asarray(det_ref.num).sum()) > 0


@pytest.mark.parametrize("payload", [False, True])
def test_flatten_pad_parity(payload):
    """flatten_pad (lane-pad AFTER the standard head convs) must reproduce
    the default path's detection set exactly."""
    from yolort_tpu.ops.nms import batched_postprocess_from_heads

    model = build_yolo(
        "yolov5_darknet_pan_n_r60",
        num_classes=12,
        pre_nms_topk=256,
        nms_tile_size=64,
        score_thresh=0.01,
    )
    params = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    K = model.head.num_outputs
    for lvl, p in params["head"].items():
        b = np.array(p["b"]).reshape(model.num_anchors, K)
        b[:, 4] += 5.0
        b[:, 5:] += rng.normal(0, 2.0, size=b[:, 5:].shape)
        params["head"][lvl] = dict(p, b=jnp.asarray(b.reshape(-1)))
    images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)), jnp.float32)
    outs = model.head_outputs(params, images)

    def post(**kw):
        return batched_postprocess_from_heads(
            outs, model.strides, model.anchor_grids,
            num_classes=model.num_classes, score_thresh=0.01,
            pre_nms_topk=256, nms_tile_size=64, topk_impl="bisect", **kw,
        )

    det_ref = post()
    det_new = post(flatten_pad=True, payload_boxes=payload)
    assert int(np.asarray(det_ref.num).sum()) > 0
    for i in range(images.shape[0]):
        assert int(det_ref.num[i]) == int(det_new.num[i])
        np.testing.assert_allclose(
            _canon(det_ref, i), _canon(det_new, i), rtol=0, atol=1e-5
        )
