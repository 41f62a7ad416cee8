"""Multi-device sharding tests on the virtual 8-device CPU mesh: the
data-parallel train step and batch-sharded inference must compile, execute,
and match single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.models.losses import pad_targets
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.parallel import (
    data_parallel_infer,
    data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from yolort_tpu.trainer import DefaultTask


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"
    return make_mesh(jax.devices()[:8])


def _batch(b):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32))
    t = [
        {"labels": np.asarray([i % 4]), "boxes_cxcywh_norm": np.asarray([[0.5, 0.5, 0.4, 0.3]])}
        for i in range(b)
    ]
    targets, mask = pad_targets(t, 4)
    return images, targets, mask


@pytest.mark.slow
def test_data_parallel_train_step(mesh):
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    task = DefaultTask(model)
    state = replicate(mesh, task.init_state(jax.random.PRNGKey(0)))
    images, targets, mask = _batch(8)
    step = data_parallel_train_step(task, mesh)
    new_state, metrics = step(
        state, shard_batch(mesh, images), shard_batch(mesh, targets), shard_batch(mesh, mask)
    )
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1

    # sharded grads must equal single-device grads (same batch)
    ref_state, ref_metrics = jax.jit(task.train_step)(
        task.init_state(jax.random.PRNGKey(0)), images, targets, mask
    )
    np.testing.assert_allclose(
        float(metrics["total"]), float(ref_metrics["total"]), rtol=1e-5
    )
    leaves = jax.tree_util.tree_leaves(new_state.params)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    for a, b in zip(leaves[:5], ref_leaves[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_2d_mesh_train_step():
    """(data=4, model=2) mesh: the reserved model axis must not break the
    DP train step (params replicated across it)."""
    mesh2 = make_mesh(jax.devices()[:8], model_axis=2)
    assert mesh2.devices.shape == (4, 2)
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    task = DefaultTask(model)
    state = replicate(mesh2, task.init_state(jax.random.PRNGKey(0)))
    images, targets, mask = _batch(4)
    step = data_parallel_train_step(task, mesh2)
    new_state, metrics = step(
        state, shard_batch(mesh2, images), shard_batch(mesh2, targets), shard_batch(mesh2, mask)
    )
    assert np.isfinite(float(metrics["total"]))


def test_data_parallel_infer_matches_single(mesh):
    model = build_yolo(
        "yolov5_darknet_pan_n_r60", num_classes=4, pre_nms_topk=128, nms_tile_size=64
    )
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))

    infer = data_parallel_infer(model, mesh)
    det_sharded = infer(replicate(mesh, params), shard_batch(mesh, images))
    det_single = model(params, images)

    np.testing.assert_array_equal(np.asarray(det_sharded.num), np.asarray(det_single.num))
    np.testing.assert_allclose(
        np.asarray(det_sharded.boxes), np.asarray(det_single.boxes), rtol=1e-4, atol=1e-4
    )
