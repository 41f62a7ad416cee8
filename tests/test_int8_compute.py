"""int8 *compute* path: calibrated activation quantization + s8xs8->s32 convs.

Parity model for the reference's ppq INT8 deployment flow
(/root/reference/deployment/ppq — calibration + engines that compute in
int8), re-designed for the TPU MXU's native int8 path.  Checks that the
quantized model's decode output and final detections track the bf16/f32
model within PTQ tolerances on realistic (fixture-checkpoint) weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO
from yolort_tpu.ops.quantization import (
    calibrate_activations,
    quantize_compute_params,
    strip_calibration,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "fixture_q.pt"
    make_checkpoint(str(path), nc=7, dm=0.33, wm=0.25, seed=3)
    info = load_from_ultralytics(str(path))
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r6.0",
        num_classes=7,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
        score_thresh=0.25,
        nms_thresh=0.45,
        pre_nms_topk=512,
    )
    params = info["params"]
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.uniform(0, 1, (2, 96, 128, 3)), jnp.float32) for _ in range(2)]
    params_c = calibrate_activations(model.head_outputs, params, calib)
    qparams = quantize_compute_params(params_c)
    return model, params, qparams


def test_int8_leaves_present_and_jit_clean(setup):
    model, params, qparams = setup
    n_int8 = sum(
        1 for l in jax.tree_util.tree_leaves(qparams) if hasattr(l, "dtype") and l.dtype == jnp.int8
    )
    assert n_int8 >= 50  # every backbone/PAN/head conv with depth >= 32
    # no leftover python-float calibration markers
    for leaf in jax.tree_util.tree_leaves(qparams):
        assert hasattr(leaf, "dtype")
    # the int8 conv path is actually in the compiled graph
    hlo = jax.jit(model.decode).lower(qparams, jnp.zeros((1, 96, 128, 3), jnp.float32)).as_text()
    assert "i8" in hlo and "convolution" in hlo


def test_int8_decode_tracks_f32(setup):
    model, params, qparams = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 128, 3)), jnp.float32)
    ref = np.asarray(jax.jit(model.decode)(params, x), np.float32)
    q = np.asarray(jax.jit(model.decode)(qparams, x), np.float32)
    # scores: obj*cls in [0,1]; PTQ tolerance
    s_ref = ref[..., 4:5] * ref[..., 5:]
    s_q = q[..., 4:5] * q[..., 5:]
    assert np.abs(s_ref - s_q).max() < 0.05
    # boxes where anything scores: within a couple of pixels
    m = (s_ref.max(-1) > 0.25) | (s_q.max(-1) > 0.25)
    if m.any():
        assert np.abs(ref[..., :4][m] - q[..., :4][m]).max() < 3.0


def test_int8_detections_match_bf16(setup):
    model, params, qparams = setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 128, 3)), jnp.float32)
    det_r = model(params, x)
    det_q = model(qparams, x)
    for i in range(2):
        nr, nq = int(det_r.num[i]), int(det_q.num[i])
        # same confident detections (allow boundary-score flips)
        br = np.asarray(det_r.boxes[i][:nr]); sr = np.asarray(det_r.scores[i][:nr])
        bq = np.asarray(det_q.boxes[i][:nq]); sq = np.asarray(det_q.scores[i][:nq])
        hr = br[sr > 0.30]; hq = bq[sq > 0.30]
        assert abs(len(hr) - len(hq)) <= 1
        for b in hr:
            if len(hq) == 0:
                continue
            xx1 = np.maximum(b[0], hq[:, 0]); yy1 = np.maximum(b[1], hq[:, 1])
            xx2 = np.minimum(b[2], hq[:, 2]); yy2 = np.minimum(b[3], hq[:, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            a1 = (b[2] - b[0]) * (b[3] - b[1])
            a2 = (hq[:, 2] - hq[:, 0]) * (hq[:, 3] - hq[:, 1])
            iou = inter / (a1 + a2 - inter + 1e-9)
            assert iou.max() > 0.85


def test_skip_and_strip(setup):
    model, params, qparams = setup
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.uniform(0, 1, (1, 96, 128, 3)), jnp.float32)]
    params_c = calibrate_activations(model.head_outputs, params, calib)
    qp = quantize_compute_params(params_c, skip=("head",))
    assert not any(
        hasattr(l, "dtype") and l.dtype == jnp.int8
        for l in jax.tree_util.tree_leaves(qp["head"])
    )
    stripped = strip_calibration(params_c)
    for leaf in jax.tree_util.tree_leaves(stripped):
        assert hasattr(leaf, "dtype")
    # stripped params still run the normal f32 path
    x = calib[0]
    a = np.asarray(jax.jit(model.decode)(params, x))
    b = np.asarray(jax.jit(model.decode)(stripped, x))
    assert np.array_equal(a, b)


def test_qconcat_same_scale_fast_path_bit_exact():
    """The identity fast path (all parts literally share the scale object,
    e.g. SPPF's input + its chained max-pools) must produce byte-identical
    output to the general rescale path it skips."""
    from yolort_tpu.ops.blocks import QTensor, _qconcat

    rng = np.random.default_rng(3)
    s = jnp.asarray(0.0173, jnp.float32)
    ref = jnp.zeros((0,), jnp.bfloat16)
    parts = [
        QTensor(jnp.asarray(rng.integers(-127, 128, (2, 4, 4, 8), dtype=np.int8)), s, ref)
        for _ in range(4)
    ]

    fast = _qconcat(parts, axis=-1)  # same scale object -> fast path

    # force the general path with a distinct-but-equal scale object
    s2 = jnp.asarray(0.0173, jnp.float32)
    parts_mixed = [QTensor(p.q, s2 if i % 2 else s, ref) for i, p in enumerate(parts)]
    slow = _qconcat(parts_mixed, axis=-1)

    assert np.array_equal(np.asarray(fast.q), np.asarray(slow.q))
    assert float(fast.s) == float(slow.s)

    # and under jit (scales become tracers; identity still holds for the
    # genuinely-shared object, e.g. pool outputs carrying v.s through)
    @jax.jit
    def f(q0, q1, sc):
        a = QTensor(q0, sc, ref)
        b = QTensor(q1, sc, ref)
        return _qconcat([a, b], axis=-1).q

    out = f(parts[0].q, parts[1].q, s)
    assert np.array_equal(
        np.asarray(out),
        np.concatenate([np.asarray(parts[0].q), np.asarray(parts[1].q)], axis=-1),
    )


def test_static_scale_qconcat_and_qadd():
    """StaticScale (trace-time-constant scales): unified scales produce a
    PURE int8 concat (no rescale in the graph), non-unified static ratios
    match the runtime-scale arithmetic, and _qadd folds static ratios."""
    from yolort_tpu.ops.blocks import QTensor, StaticScale, _qadd, _qconcat

    rng = np.random.default_rng(4)
    ref = jnp.zeros((0,), jnp.bfloat16)
    q0 = jnp.asarray(rng.integers(-127, 128, (2, 4, 4, 8), dtype=np.int8))
    q1 = jnp.asarray(rng.integers(-127, 128, (2, 4, 4, 8), dtype=np.int8))

    # unified static scales -> bytes pass through untouched
    a = QTensor(q0, StaticScale(0.02), ref)
    b = QTensor(q1, StaticScale(0.02), ref)
    out = _qconcat([a, b], axis=-1)
    assert isinstance(out.s, StaticScale) and out.s.v == 0.02
    assert np.array_equal(
        np.asarray(out.q), np.concatenate([np.asarray(q0), np.asarray(q1)], -1)
    )
    # the unified concat compiles to a graph with NO multiply
    hlo = jax.jit(
        lambda x, y: _qconcat(
            [QTensor(x, StaticScale(0.02), ref), QTensor(y, StaticScale(0.02), ref)],
            axis=-1,
        ).q
    ).lower(q0, q1).as_text()
    assert "multiply" not in hlo

    # non-unified static ratio matches the runtime-scale general path
    c = QTensor(q1, StaticScale(0.01), ref)
    out_static = _qconcat([a, c], axis=-1)
    out_runtime = _qconcat(
        [
            QTensor(q0, jnp.asarray(0.02, jnp.float32), ref),
            QTensor(q1, jnp.asarray(0.01, jnp.float32), ref),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(out_static.q), np.asarray(out_runtime.q), atol=1
    )
    assert abs(out_static.s.v - float(out_runtime.s)) < 1e-8  # f64 vs f32 repr

    # _qadd with static scales tracks the runtime formula
    add_static = _qadd(a, c, StaticScale(0.03))
    add_runtime = _qadd(
        QTensor(q0, jnp.asarray(0.02, jnp.float32), ref),
        QTensor(q1, jnp.asarray(0.01, jnp.float32), ref),
        jnp.asarray(0.03, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(add_static.q), np.asarray(add_runtime.q), atol=1
    )


def test_finalize_scales_static_tree_and_parity(setup):
    """finalize_scales: scales become trace-time constants, every concat
    group is unified (zero rescale multiplies at concat boundaries), and
    the detections stay within the same PTQ envelope as the runtime-scale
    tree."""
    from yolort_tpu.ops.blocks import StaticScale
    from yolort_tpu.ops.quantization import finalize_scales

    model, params, qparams = setup
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 128, 3)), jnp.float32)
    qs = finalize_scales(model.head_outputs, qparams, np.asarray(x[:1, :32, :32]))

    statics = [
        l for l in jax.tree_util.tree_leaves(
            qs, is_leaf=lambda v: isinstance(v, StaticScale))
        if isinstance(l, StaticScale)
    ]
    assert len(statics) >= 20
    # no runtime scale scalars remain
    def leaves_with_key(node, key):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == key and not isinstance(v, dict):
                    yield v
                else:
                    yield from leaves_with_key(v, key)
    for key in ("xs", "os", "as"):
        for v in leaves_with_key(qs, key):
            assert isinstance(v, StaticScale), key

    # decode tracks the runtime-scale tree (group-max raising costs at most
    # ~1 rounding bit on the raised tensors)
    d_rt = np.asarray(jax.jit(model.decode)(qparams, x), np.float32)
    d_st = np.asarray(jax.jit(model.decode)(qs, x), np.float32)
    s_rt = d_rt[..., 4:5] * d_rt[..., 5:]
    s_st = d_st[..., 4:5] * d_st[..., 5:]
    assert np.abs(s_rt - s_st).max() < 0.05
