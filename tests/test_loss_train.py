"""Loss + training-step tests: invariants mirroring the reference's
SetCriterion tests (test_models.py:302-363, incl. the empty-target edge) plus
a convergence smoke (loss decreases under SGD)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.models.losses import YOLOLoss, bbox_ciou, bce_with_logits, pad_targets
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.trainer import DefaultTask, make_train_step


def _model_and_outputs(nc=8, seed=0, b=2, hw=64):
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=nc)
    params = model.init(jax.random.PRNGKey(seed))
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (b, hw, hw, 3))
    outs = model.head_outputs(params, x)
    return model, params, x, outs


def _loss_for(model):
    return YOLOLoss(
        strides=model.strides, anchor_grids=model.anchor_grids, num_classes=model.num_classes
    )


def test_bbox_ciou_identity_and_disjoint():
    b = jnp.asarray([[5.0, 5.0, 4.0, 4.0]])
    assert float(bbox_ciou(b, b)[0]) == pytest.approx(1.0, abs=1e-5)
    b2 = jnp.asarray([[100.0, 100.0, 4.0, 4.0]])
    assert float(bbox_ciou(b, b2)[0]) < 0.0  # CIoU is negative for far boxes


def test_bce_with_logits_matches_manual():
    logits = jnp.linspace(-3, 3, 7)
    targets = jnp.asarray([0, 0, 1, 1, 1, 0, 1], jnp.float32)
    got = np.asarray(bce_with_logits(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    ref = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_loss_empty_targets():
    """Empty targets: box/cls loss 0, obj loss > 0 (reference
    test_criterion edge, test_models.py:349-363)."""
    model, params, x, outs = _model_and_outputs()
    loss = _loss_for(model)
    targets = jnp.zeros((2, 8, 5))
    mask = jnp.zeros((2, 8), bool)
    d = loss(outs, targets, mask)
    assert float(d["bbox_regression"]) == 0.0
    assert float(d["cls_logits"]) == 0.0
    assert float(d["objectness"]) > 0.0
    assert all(np.isfinite(float(v)) for v in d.values())


def test_loss_with_targets_finite_and_positive():
    model, params, x, outs = _model_and_outputs()
    rng = np.random.default_rng(0)
    t = [
        {
            "labels": rng.integers(0, 8, 5),
            "boxes_cxcywh_norm": np.clip(rng.uniform(0.2, 0.8, (5, 4)), 0.05, 0.95),
        }
        for _ in range(2)
    ]
    targets, mask = pad_targets(t, 16)
    assert targets.shape == (2, 16, 5) and mask.shape == (2, 16)
    assert int(mask.sum()) == 10
    loss = _loss_for(model)
    d = loss(outs, targets, mask)
    for k, v in d.items():
        assert np.isfinite(float(v)) and float(v) > 0.0, k


@pytest.mark.slow
def test_train_step_decreases_loss():
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    task = DefaultTask(model, lr=0.05)
    state = task.init_state(jax.random.PRNGKey(0))
    step = make_train_step(task)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    t = [
        {
            "labels": np.asarray([1, 2]),
            "boxes_cxcywh_norm": np.asarray([[0.5, 0.5, 0.3, 0.3], [0.2, 0.3, 0.1, 0.2]]),
        }
        for _ in range(2)
    ]
    targets, mask = pad_targets(t, 8)

    state, m0 = step(state, images, targets, mask)
    losses = [float(m0["total"])]
    for _ in range(5):
        state, m = step(state, images, targets, mask)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


@pytest.mark.slow
def test_gradients_nonzero_everywhere():
    """Every parameter leaf should receive gradient signal from the loss."""
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    task = DefaultTask(model)
    params = model.init(jax.random.PRNGKey(0))
    images = jnp.ones((1, 64, 64, 3)) * 0.5
    t = [{"labels": np.asarray([0]), "boxes_cxcywh_norm": np.asarray([[0.5, 0.5, 0.4, 0.4]])}]
    targets, mask = pad_targets(t, 4)
    grads = jax.grad(lambda p: task.loss_fn(p, images, targets, mask)[0])(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(k) for k, g in flat if float(jnp.abs(g).max()) == 0.0]
    # BN-stats leaves (mean/var) legitimately have zero grads in eval-form
    zero = [k for k in zero if "mean" not in k and "var" not in k]
    assert not zero, f"zero-grad leaves: {zero[:10]}"
