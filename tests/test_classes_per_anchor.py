"""classes_per_anchor stage-2 cut: exact when anchors carry few
above-threshold classes (the real-weights regime)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import batched_postprocess_from_heads


def _synthetic_heads(rng, b=1, hw=(8, 8), nc=20, na=3, hot_classes=2):
    """Head logits where each anchor has `hot_classes` clearly-above-threshold
    classes and the rest far below (a realistic trained-model profile)."""
    h, w = hw
    k = 5 + nc
    logits = rng.normal(-8.0, 0.5, (b, h, w, na * k)).astype(np.float32)
    lv = logits.reshape(b, h, w, na, k)
    lv[..., 0:4] = rng.normal(0, 1, lv[..., 0:4].shape)  # box logits
    lv[..., 4] = rng.normal(2.0, 0.5, lv[..., 4].shape)  # confident obj
    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                for ai in range(na):
                    hot = rng.choice(nc, hot_classes, replace=False)
                    lv[bi, yy, xx, ai, 5 + hot] = rng.normal(2.0, 0.5, hot_classes)
    return [jnp.asarray(logits)]


def test_cpa_exact_when_few_hot_classes():
    rng = np.random.default_rng(0)
    heads = _synthetic_heads(rng, nc=20, hot_classes=2)
    kwargs = dict(
        num_classes=20, score_thresh=0.05, nms_thresh=0.45,
        detections_per_img=100, pre_nms_topk=256, nms_tile_size=64,
    )
    exact = batched_postprocess_from_heads(heads, (8,), [(10, 13, 16, 30, 33, 23)], **kwargs)
    cpa = batched_postprocess_from_heads(
        heads, (8,), [(10, 13, 16, 30, 33, 23)], classes_per_anchor=4, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(exact.num), np.asarray(cpa.num))
    np.testing.assert_allclose(np.asarray(exact.boxes), np.asarray(cpa.boxes), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(exact.labels), np.asarray(cpa.labels))
    np.testing.assert_allclose(np.asarray(exact.scores), np.asarray(cpa.scores), atol=1e-6)
    assert int(exact.num[0]) > 0
