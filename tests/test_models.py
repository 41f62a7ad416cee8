"""Model-component shape tests across architectures, mirroring the
reference's test/test_models.py TestModel parametrization (:188-199)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.models.darknet import DarkNet
from yolort_tpu.models.head import YOLOHead, make_grids_and_shifts
from yolort_tpu.models.pan import PathAggregationNetwork
from yolort_tpu.models.yolo import YOLO, build_yolo
from yolort_tpu.ops.nms import Detections


@pytest.mark.parametrize(
    "version,dm,wm",
    [("r6.0", 0.33, 0.5), ("r4.0", 0.33, 0.5), ("r3.1", 0.33, 0.5), ("r6.0", 0.33, 0.25)],
)
def test_backbone_shapes(version, dm, wm):
    bb = DarkNet(dm, wm, version)
    p = bb.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    feats = bb(p, x)
    assert len(feats) == 3
    chans = bb.out_channels
    for f, stride, c in zip(feats, (8, 16, 32), chans):
        assert f.shape == (1, 64 // stride, 64 // stride, c)


@pytest.mark.parametrize("version", ["r6.0", "r4.0", "r3.1"])
def test_pan_shapes(version):
    ch = (128, 256, 512)
    pan = PathAggregationNetwork(ch, 0.33, version=version)
    p = pan.init(jax.random.PRNGKey(0))
    feats = [jnp.zeros((1, 8 * 2 ** (2 - i), 8 * 2 ** (2 - i), c)) for i, c in enumerate(ch)]
    outs = pan(p, feats)
    assert len(outs) == 3
    for o, f, c in zip(outs, feats, ch):
        assert o.shape == f.shape[:3] + (c,)


@pytest.mark.slow
def test_pan_p6_shapes():
    ch = (128, 256, 384, 512)
    pan = PathAggregationNetwork(ch, 0.33, version="r6.0", use_p6=True)
    p = pan.init(jax.random.PRNGKey(0))
    feats = [jnp.zeros((1, 8 * 2 ** (2 - i), 8 * 2 ** (2 - i), c)) for i, c in enumerate(ch[:3])]
    outs = pan(p, feats)
    assert len(outs) == 4
    assert outs[3].shape == (1, 4, 4, ch[3])  # P6 @ stride 64


def test_head_shapes_and_bias_init():
    head = YOLOHead((128, 256, 512), 3, (8, 16, 32), 80)
    p = head.init(jax.random.PRNGKey(0))
    feats = [jnp.zeros((2, 32, 24, 128)), jnp.zeros((2, 16, 12, 256)), jnp.zeros((2, 8, 6, 512))]
    outs = head(p, feats)
    assert [o.shape for o in outs] == [(2, 32, 24, 255), (2, 16, 12, 255), (2, 8, 6, 255)]
    # bias init golden values (reference box_head.py:40-46)
    b0 = np.asarray(p["0"]["b"]).reshape(3, 85)
    assert np.allclose(b0[:, 4].mean(), np.log(8 / (640 / 8) ** 2), atol=0.05)
    assert np.allclose(b0[:, 5:].mean(), np.log(0.6 / (80 - 0.999999)), atol=0.05)


def test_grids_and_shifts_values():
    """Golden values mirroring test_models_anchor_utils.py:14."""
    grids, shifts = make_grids_and_shifts(
        [(2, 2)], [4], [(6, 14)],
    )
    g = np.asarray(grids[0])  # (H*W*A, 2) = (4*1? no: 2*2*1... ) -> na=1
    assert g.shape == (4, 2)
    np.testing.assert_array_equal(g, [[0, 0], [1, 0], [0, 1], [1, 1]])
    s = np.asarray(shifts[0])
    np.testing.assert_array_equal(s, [[6, 14]] * 4)


@pytest.mark.parametrize("arch", ["yolov5_darknet_pan_n_r60", "yolov5_darknet_tan_s_r40"])
def test_full_model_inference_shapes(arch):
    model = build_yolo(arch, num_classes=12, pre_nms_topk=256, nms_tile_size=64)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    det = model(params, x)
    assert isinstance(det, Detections)
    assert det.boxes.shape == (2, 300, 4)
    assert det.scores.shape == (2, 300)
    assert det.labels.shape == (2, 300)
    assert det.num.shape == (2,)


def test_full_model_p6():
    model = build_yolo("yolov5_darknet_pan_n6_r60", num_classes=4, pre_nms_topk=128, nms_tile_size=64)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    outs = model.head_outputs(params, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]  # strides 8,16,32,64
    det = model(params, x)
    assert det.boxes.shape == (1, 300, 4)


def test_jit_vs_eager_parity():
    """Compiled == eager (the reference's TorchScript-parity invariant,
    test_models.py:30-90, atol 3e-4)."""
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=6, pre_nms_topk=128, nms_tile_size=64)
    params = model.init(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    eager = model.decode(params, x)
    jitted = jax.jit(model.decode)(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-4, atol=3e-4)
