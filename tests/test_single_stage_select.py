"""Single-stage full-domain selection (the fast TPU path): final detections
must match the two-stage f32 path whenever the above-threshold candidate
count fits in pre_nms_topk (then the bf16 key selection over-selects a
superset and the exact-f32 re-score/re-sort restores reference semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import batched_postprocess_from_heads

ANCHORS = [(10, 13, 16, 30, 33, 23)]


def _synthetic_heads(rng, b=2, hw=(8, 8), nc=20, na=3, hot_classes=2, obj_mu=2.0):
    h, w = hw
    k = 5 + nc
    logits = rng.normal(-8.0, 0.5, (b, h, w, na * k)).astype(np.float32)
    lv = logits.reshape(b, h, w, na, k)
    lv[..., 0:4] = rng.normal(0, 1, lv[..., 0:4].shape)
    lv[..., 4] = rng.normal(obj_mu, 0.5, lv[..., 4].shape)
    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                for ai in range(na):
                    hot = rng.choice(nc, hot_classes, replace=False)
                    lv[bi, yy, xx, ai, 5 + hot] = rng.normal(2.0, 0.5, hot_classes)
    return [jnp.asarray(logits)]


@pytest.mark.parametrize("score_thresh,topk", [(0.05, 512), (0.005, 512)])
def test_single_stage_matches_two_stage(score_thresh, topk):
    rng = np.random.default_rng(0)
    heads = _synthetic_heads(rng)
    kwargs = dict(
        num_classes=20, score_thresh=score_thresh, nms_thresh=0.45,
        detections_per_img=100, pre_nms_topk=topk, nms_tile_size=64,
    )
    two = batched_postprocess_from_heads(
        heads, (8,), ANCHORS, selection="two_stage", topk_impl="topk", **kwargs
    )
    one = batched_postprocess_from_heads(
        heads, (8,), ANCHORS, selection="single", **kwargs
    )
    np.testing.assert_array_equal(np.asarray(two.num), np.asarray(one.num))
    np.testing.assert_array_equal(np.asarray(two.labels), np.asarray(one.labels))
    # boxes/scores recomputed in f32 from the same logits on both paths;
    # differences only via sigmoid-eval order => tight tolerance
    np.testing.assert_allclose(np.asarray(two.scores), np.asarray(one.scores),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(two.boxes), np.asarray(one.boxes),
                               rtol=0, atol=1e-4)
    assert int(np.asarray(two.num).sum()) > 0


def test_single_stage_bf16_inputs():
    """bf16 head outputs (the serving dtype) run the same path."""
    rng = np.random.default_rng(1)
    heads = [h.astype(jnp.bfloat16) for h in _synthetic_heads(rng, b=1)]
    out = batched_postprocess_from_heads(
        heads, (8,), ANCHORS, selection="single",
        num_classes=20, score_thresh=0.05, nms_thresh=0.45,
        detections_per_img=50, pre_nms_topk=256, nms_tile_size=64,
    )
    n = int(out.num[0])
    assert n > 0
    s = np.asarray(out.scores[0][:n])
    assert np.all(np.diff(s) <= 1e-6)  # descending by exact f32 score
    assert np.all(s > 0.05)


def test_single_stage_empty_image():
    """No candidate above threshold -> zero detections, no fabrication."""
    rng = np.random.default_rng(2)
    heads = _synthetic_heads(rng, b=1, obj_mu=-12.0, hot_classes=1)
    out = batched_postprocess_from_heads(
        heads, (8,), ANCHORS, selection="single",
        num_classes=20, score_thresh=0.4, nms_thresh=0.45,
        detections_per_img=50, pre_nms_topk=256, nms_tile_size=64,
    )
    assert int(out.num[0]) == 0
    assert not bool(np.asarray(out.valid).any())
