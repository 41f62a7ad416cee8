"""AOT artifact round-trip: export -> load -> predict must match the live
model (the reference pins ORT-vs-eager at rtol 1e-3/atol 1e-5,
test/test_runtime_ort.py:44-59; here the serialized StableHLO program is the
deployed artifact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch, make_plan
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.runtime import AOTPredictor, export_aot, load_aot


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = build_yolo(
        "yolov5_darknet_pan_n_r60", num_classes=4, score_thresh=1e-5,
        pre_nms_topk=128, nms_tile_size=64,
    )
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("aot") / "model.ytpu")
    export_aot(model, params, path, batch_size=2, input_hw=(96, 96), dtype=jnp.float32)
    return model, params, path


def test_aot_roundtrip_matches_live(exported):
    model, params, path = exported
    pred = load_aot(path)
    assert pred.meta["batch_size"] == 2 and pred.meta["input_hw"] == [96, 96]

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (2, 96, 96, 3), np.uint8)

    outs = pred.predict(raw)
    assert len(outs) == 2

    # live pipeline for comparison
    plan = make_plan([(96, 96)], 96, 96)[0]
    imgs = jnp.asarray(raw).astype(jnp.float32) / 255.0
    det = model(params, letterbox_batch(imgs, plan))
    for i in range(2):
        n = int(det.num[i])
        assert len(outs[i]["boxes"]) == n
        np.testing.assert_allclose(
            outs[i]["boxes"], np.asarray(det.boxes[i][:n]), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            outs[i]["scores"], np.asarray(det.scores[i][:n]), rtol=1e-3, atol=1e-5
        )


def test_aot_shape_mismatch_error(exported):
    _, _, path = exported
    pred = load_aot(path)
    with pytest.raises(ValueError, match="does not match exported spec"):
        pred(np.zeros((1, 96, 96, 3), np.uint8))


def test_train_state_roundtrip(tmp_path):
    from yolort_tpu.trainer import DefaultTask
    from yolort_tpu.trainer.checkpoint import load_train_state, save_train_state, strip_optimizer
    from yolort_tpu.models._checkpoint import load_params

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=2)
    task = DefaultTask(model)
    state = task.init_state(jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "train.npz")
    save_train_state(p, state, {"epoch": 3})
    restored, meta = load_train_state(p, task)
    assert int(restored.step) == 7 and meta["epoch"] == 3
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    out = strip_optimizer(p, str(tmp_path / "deploy.npz"))
    params, meta2 = load_params(out)
    assert meta2["stripped"] is True
    assert len(jax.tree_util.tree_leaves(params)) == len(a)


def test_ensemble():
    from yolort_tpu.models.ensemble import Ensemble

    m1 = build_yolo("yolov5_darknet_pan_n_r60", num_classes=3, score_thresh=1e-5,
                    pre_nms_topk=128, nms_tile_size=64)
    m2 = build_yolo("yolov5_darknet_pan_n_r60", num_classes=3, score_thresh=1e-5,
                    pre_nms_topk=128, nms_tile_size=64)
    p1 = m1.init(jax.random.PRNGKey(0))
    p2 = m2.init(jax.random.PRNGKey(1))
    ens = Ensemble([m1, m2], [p1, p2])
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 96, 96, 3))
    det = ens(x)
    assert det.boxes.shape == (1, 300, 4)
    assert int(det.num[0]) > 0


def test_experimental_blocks():
    from yolort_tpu.ops.experimental import CrossConv, MixConv2d, Sum

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    cc = CrossConv(16, 32, k=3, s=2)
    assert cc(cc.init(jax.random.PRNGKey(1)), x).shape == (1, 4, 4, 32)
    mc = MixConv2d(16, 24, k=(1, 3))
    assert mc(mc.init(jax.random.PRNGKey(2)), x).shape == (1, 8, 8, 24)
    s = Sum(2, weight=True)
    out = s(s.init(jax.random.PRNGKey(3)), [x, x])
    assert out.shape == x.shape
