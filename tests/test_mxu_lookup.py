"""MXU one-hot row lookups: bit-exactness vs plain indexing, and parity of
select_topk_threshold / the full postprocess under row_gather/box_gather
overrides.  These replace XLA's latency-bound k-row gathers in the selection
machinery (reference semantics unchanged: yolort/models/box_head.py:388-429).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.ops.nms import (
    mxu_narrow_lookup,
    mxu_row_lookup,
    select_topk_threshold,
)


@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int16])
def test_mxu_row_lookup_bit_exact(dtype):
    rng = np.random.default_rng(0)
    info = np.iinfo(np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype))
    m, w, k = 37, 8, 101
    table = jnp.asarray(
        rng.integers(info.min, info.max + 1, size=(m, w)), dtype
    )
    idx = jnp.asarray(rng.integers(0, m, size=(k,)), jnp.int32)
    got = mxu_row_lookup(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])
    assert got.dtype == table.dtype


def test_mxu_row_lookup_extreme_bits():
    """Sign/overflow corners: INT_MIN, INT_MAX, -1, 0 byte patterns."""
    vals = np.array(
        [[-(2**31), 2**31 - 1, -1, 0, 255, -256, 2**24, -(2**24)]], np.int32
    )
    table = jnp.asarray(np.repeat(vals, 5, axis=0) + np.arange(5, dtype=np.int32)[:, None])
    idx = jnp.asarray([4, 0, 3, 3, 1], jnp.int32)
    got = mxu_row_lookup(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])


def test_mxu_narrow_lookup_f32_bit_exact():
    rng = np.random.default_rng(1)
    m, p, k = 515, 4, 300  # m deliberately not a multiple of the block
    table = jnp.asarray(
        rng.normal(scale=1e3, size=(m, p)).astype(np.float32)
    )
    idx = jnp.asarray(rng.integers(0, m, size=(k,)), jnp.int32)
    got = mxu_narrow_lookup(table, idx)
    a = np.asarray(got).view(np.uint32)
    b = np.asarray(table)[np.asarray(idx)].view(np.uint32)
    np.testing.assert_array_equal(a, b)  # exact down to the bit pattern


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_select_topk_row_gather_mxu_parity(dtype):
    """row_gather='mxu' must reproduce the XLA-gather selection exactly."""
    rng = np.random.default_rng(2)
    flat = jnp.asarray(rng.normal(size=(1024,)), dtype)
    v0, i0 = select_topk_threshold(flat, 64, 0.1, row_gather="xla")
    v1, i1 = select_topk_threshold(flat, 64, 0.1, row_gather="mxu")
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert int(np.sum(np.asarray(v0) > 0.1)) > 0


def test_postprocess_gather_impl_parity():
    """Full two-stage postprocess: MXU row/box lookups == XLA gathers."""
    from dataclasses import replace

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.ops.nms import batched_postprocess_from_heads

    model = build_yolo(
        "yolov5_darknet_pan_n_r60",
        num_classes=12,
        pre_nms_topk=256,
        nms_tile_size=64,
        score_thresh=0.01,
    )
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    K = model.head.num_outputs
    for lvl, p in params["head"].items():
        b = np.array(p["b"]).reshape(model.num_anchors, K)
        b[:, 4] += 5.0
        b[:, 5:] += rng.normal(0, 2.0, size=b[:, 5:].shape)
        params["head"][lvl] = dict(p, b=jnp.asarray(b.reshape(-1)))
    images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)), jnp.float32)
    outs = model.head_outputs(params, images)

    def post(row_gather, box_gather):
        return batched_postprocess_from_heads(
            outs, model.strides, model.anchor_grids,
            num_classes=model.num_classes, score_thresh=0.01,
            pre_nms_topk=256, nms_tile_size=64, topk_impl="bisect",
            row_gather=row_gather, box_gather=box_gather,
        )

    ref = post("xla", "xla")
    got = post("mxu", "mxu")
    assert int(np.asarray(ref.num).sum()) > 0
    for f in ("boxes", "scores", "labels", "valid", "num"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), err_msg=f
        )
