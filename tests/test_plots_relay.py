"""Plots, relay-compat surfaces, and the s2d stem equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_plot_images_mosaic(tmp_path):
    from yolort_tpu.utils.plots import plot_images

    imgs = np.random.default_rng(0).uniform(0, 1, (4, 32, 48, 3)).astype(np.float32)
    targets = np.asarray([[0, 1, 0.5, 0.5, 0.4, 0.4], [2, 0, 0.3, 0.3, 0.2, 0.2]])
    out = tmp_path / "mosaic.jpg"
    mosaic = plot_images(imgs, targets, fname=str(out))
    assert mosaic.shape == (64, 96, 3) and out.exists()


def test_pr_curves(tmp_path):
    from yolort_tpu.utils.plots import plot_mc_curve, plot_pr_curve

    x = np.linspace(0, 1, 101)
    plot_pr_curve(x, {"all": 1 - x * 0.5}, fname=str(tmp_path / "pr.png"))
    plot_mc_curve(x, {"F1": x * (1 - x) * 4}, fname=str(tmp_path / "f1.png"))
    assert (tmp_path / "pr.png").exists() and (tmp_path / "f1.png").exists()


def test_logits_decoder_surface():
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.relay import LogitsDecoder

    m = build_yolo("yolov5_darknet_pan_n_r60", num_classes=5)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    boxes, scores = LogitsDecoder(m)(p, x)
    na = sum((64 // s) ** 2 * 3 for s in (8, 16, 32))
    assert boxes.shape == (1, na, 4)
    assert scores.shape == (1, na, 5)
    # xyxy ordering
    assert float(jnp.mean((boxes[..., 2] - boxes[..., 0]))) > 0


def test_get_trace_module_lowers():
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.relay import get_trace_module, register_nms

    m = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4,
                   pre_nms_topk=128, nms_tile_size=64)
    p = m.init(jax.random.PRNGKey(0))
    fn, lowered = get_trace_module(m, p, batch_size=1, input_hw=(64, 64))
    text = lowered.as_text()
    assert "stablehlo" in text or "func.func" in text
    with pytest.raises(NotImplementedError):
        register_nms()


def test_stem_s2d_exact():
    from dataclasses import replace

    from yolort_tpu.models.darknet import stem_to_s2d
    from yolort_tpu.models.yolo import build_yolo

    m = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4,
                   pre_nms_topk=128, nms_tile_size=64, score_thresh=1e-6)
    params = m.init(jax.random.PRNGKey(0))
    m2 = replace(m, stem_s2d=True)
    params2 = stem_to_s2d(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    d1, d2 = m(params, x), m2(params2, x)
    np.testing.assert_array_equal(np.asarray(d1.num), np.asarray(d2.num))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d2.boxes), atol=1e-5)
