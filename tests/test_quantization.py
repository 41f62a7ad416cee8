"""PTQ quantization tests: round-trip error bounds + detection parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.quantization import (
    CalibrationObserver,
    dequantize_params,
    dequantize_tensor,
    quantization_error,
    quantize_params,
    quantize_tensor_per_channel,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (3, 3, 16, 32)).astype(np.float32)
    q, scale = quantize_tensor_per_channel(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = np.asarray(dequantize_tensor(jnp.asarray(q), jnp.asarray(scale)))
    # symmetric int8: error bounded by scale/2 per channel
    err = np.abs(deq - w)
    assert (err <= scale[None, None, None, :] * 0.5 + 1e-7).all()


def test_quantize_params_structure_and_error():
    from yolort_tpu.models.yolo import build_yolo

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    params = model.init(jax.random.PRNGKey(0))
    qp = quantize_params(params)
    # large conv weights got quantized
    w0 = qp["backbone"]["1"]["w"]
    assert isinstance(w0, dict) and w0["q"].dtype == jnp.int8
    errs = quantization_error(params, qp)
    assert all(v < 0.02 for v in errs.values()), errs


def test_quantized_model_detection_parity():
    from yolort_tpu.models.yolo import build_yolo

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4,
                       pre_nms_topk=128, nms_tile_size=64, score_thresh=1e-5)
    params = model.init(jax.random.PRNGKey(0))
    qp = dequantize_params(quantize_params(params), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    d_fp = model(params, x)
    d_q = model(qp, x)
    n = int(d_fp.num[0])
    nq = int(d_q.num[0])
    assert abs(n - nq) <= max(2, int(0.05 * n))  # near-identical detection count
    m = min(n, nq, 50)
    # top detections should coincide closely
    np.testing.assert_allclose(
        np.asarray(d_fp.boxes[0][:m]), np.asarray(d_q.boxes[0][:m]), atol=3.0
    )


def test_calibration_observer():
    obs = CalibrationObserver(momentum=0.5)
    obs.observe("act0", jnp.asarray([1.0, -2.0]))
    obs.observe("act0", jnp.asarray([4.0]))
    assert obs.ranges["act0"] == pytest.approx(3.0)
    assert obs.scales()["act0"] == pytest.approx(3.0 / 127.0)
