"""Streaming pipeline + fixed-shape heterogeneous batching tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_streaming_pipeline_counts_and_shapes():
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.runtime.streaming import StreamingPipeline

    model = build_yolo(
        "yolov5_darknet_pan_n_r60", num_classes=4, score_thresh=1e-6,
        pre_nms_topk=128, nms_tile_size=64,
    )
    params = model.init(jax.random.PRNGKey(0))
    pipe = StreamingPipeline(model, params, batch_size=4, input_hw=(64, 64), dtype=jnp.float32)
    pipe.warmup(1)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(10)]
    outs = list(pipe.run(iter(frames)))
    assert len(outs) == 10  # tail batch padded internally but only 10 yielded
    for o in outs:
        assert set(o) == {"boxes", "scores", "labels"}


def test_fixed_shape_heterogeneous_batch():
    import yolort_tpu

    m = yolort_tpu.YOLOv5(
        arch="yolov5_darknet_pan_n_r60", num_classes=4, score_thresh=1e-6,
        size=(64, 64), fixed_shape=(64, 64), pre_nms_topk=128, nms_tile_size=64,
    )
    rng = np.random.default_rng(1)
    imgs = [
        rng.uniform(0, 1, (50, 70, 3)).astype(np.float32),
        rng.uniform(0, 1, (64, 48, 3)).astype(np.float32),
        rng.uniform(0, 1, (30, 30, 3)).astype(np.float32),
    ]
    # mixed shapes -> single fixed-canvas program (host letterbox)
    preds = m(imgs)
    assert len(preds) == 3

    # the fixed-canvas path must agree with the per-image in-graph path
    # (same canvas/offsets; only the resize backend differs: cv2 vs jax)
    single = m([imgs[0]])[0]
    p0 = preds[0]
    n = min(len(single["boxes"]), len(p0["boxes"]))
    assert abs(len(single["boxes"]) - len(p0["boxes"])) <= max(3, int(0.1 * n))
    m_cnt = min(n, 30)
    np.testing.assert_allclose(
        p0["scores"][:m_cnt], single["scores"][:m_cnt], atol=5e-3
    )
    np.testing.assert_allclose(
        p0["boxes"][:m_cnt], single["boxes"][:m_cnt], atol=3.0
    )
