"""High-level training loop.

The Lightning-free equivalent of ``pl.Trainer.fit`` +
``DefaultTask.training_step/validation_step/test_step``
(reference yolort/trainer/lightning_task.py:75-109): epochs over a
DetectionDataModule, EMA shadow, metric logging, COCO evaluation, early
stopping, checkpointing — all around the pure jitted train step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolort_tpu.data.coco_eval import COCOEvaluator
from yolort_tpu.models._checkpoint import save_params
from yolort_tpu.models.transform import scale_coords_back
from yolort_tpu.trainer.task import DefaultTask, TrainState, make_train_step
from yolort_tpu.trainer.utils import EarlyStopping, ModelEMA
from yolort_tpu.utils.logger import MetricLogger


def evaluate(model, params, data_module, canvas_hw, mesh=None) -> Dict[str, float]:
    """COCO-protocol evaluation over a DetectionDataModule.

    mesh: optional jax.sharding.Mesh — batches are sharded over its 'data'
    axis and run multi-chip (the inference the reference explicitly does
    not support, tools/eval_metric.py:109); params are replicated.
    """
    if mesh is not None:
        from yolort_tpu.parallel.mesh import data_parallel_infer, replicate, shard_batch

        infer = data_parallel_infer(model, mesh)
        params = replicate(mesh, params)
    else:
        infer = jax.jit(lambda p, x: model(p, x))
    ev = COCOEvaluator()
    for batch in data_module.batches():
        images = jnp.asarray(batch["images"])
        if mesh is not None:
            # the final batch of an epoch can be partial (drop_last=False);
            # pad it up to a multiple of the data-axis size so the NamedSharding
            # placement is valid — padded rows are never read (the result loop
            # below only walks the real batch["raw_targets"])
            d = mesh.shape["data"]
            pad = (-images.shape[0]) % d
            if pad:
                images = jnp.concatenate([images, jnp.repeat(images[:1], pad, axis=0)], axis=0)
            images = shard_batch(mesh, images)
        det = jax.device_get(infer(params, images))
        preds, tgts = [], []
        for j, raw in enumerate(batch["raw_targets"]):
            n = int(det.num[j])
            oh, ow = (int(v) for v in raw["orig_size"])
            boxes = np.asarray(
                scale_coords_back(
                    jnp.asarray(det.boxes[j][:n]), canvas_hw, jnp.asarray([oh, ow], jnp.float32)
                )
            )
            preds.append(
                {"boxes": boxes, "scores": np.asarray(det.scores[j][:n]),
                 "labels": np.asarray(det.labels[j][:n])}
            )
            tgts.append({"boxes": raw["boxes"], "labels": raw["labels"]})
        ev.update(preds, tgts)
    ev.synchronize_between_processes()
    return ev.compute()


def fit(
    task: DefaultTask,
    train_data,
    val_data=None,
    *,
    max_epochs: int = 10,
    seed: int = 0,
    use_ema: bool = True,
    patience: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    print_freq: int = 50,
    state: Optional[TrainState] = None,
    mesh=None,
) -> TrainState:
    """Train; returns the final TrainState (EMA params in state if enabled).

    mesh: optional jax.sharding.Mesh — the train step runs data-parallel
    over its 'data' axis (params/opt-state replicated, XLA inserts the
    gradient all-reduce over ICI) and validation shards the same way.
    """
    if mesh is not None:
        from yolort_tpu.parallel.mesh import data_parallel_train_step, replicate

        step_fn = data_parallel_train_step(task, mesh)
    else:
        step_fn = make_train_step(task)
    state = state or task.init_state(jax.random.PRNGKey(seed))
    if mesh is not None:
        state = replicate(mesh, state)
    # seed the EMA with the pre-training params, like the reference's
    # deepcopy-at-construction (v5/utils/torch_utils.py:345) — the first
    # update must BLEND toward step-1 params, not copy them
    ema = ModelEMA(params=jax.tree_util.tree_map(jnp.asarray, state.params)) if use_ema else None
    stopper = EarlyStopping(patience=patience) if patience else None
    logger = MetricLogger()

    for epoch in range(max_epochs):
        for batch in logger.log_every(
            train_data.batches(), print_freq, header=f"Epoch {epoch}:"
        ):
            bi, bt, bm = (
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["targets"]),
                jnp.asarray(batch["target_mask"]),
            )
            if mesh is not None:
                from yolort_tpu.parallel.mesh import shard_batch

                # partial final batch: gradients from padded rows would bias
                # the loss, so mesh training drops it (DDP-style drop_last)
                if bi.shape[0] % mesh.shape["data"]:
                    continue
                bi, bt, bm = shard_batch(mesh, bi), shard_batch(mesh, bt), shard_batch(mesh, bm)
            state, metrics = step_fn(state, bi, bt, bm)
            logger.update(**{k: float(v) for k, v in metrics.items()})
            # per-step EMA with the decay ramp, matching the reference
            # ModelEMA semantics (v5/utils/torch_utils.py:339-377: update on
            # every optimizer step, d = decay*(1-exp(-updates/tau)))
            if ema is not None:
                ema.update(state.params)

        if val_data is not None:
            eval_params = ema.params if ema is not None else state.params
            results = evaluate(task.model, eval_params, val_data, val_data.canvas_hw,
                               mesh=mesh)
            print(f"Epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in results.items()))
            fitness = 0.1 * results.get("AP50", 0.0) + 0.9 * results.get("AP", 0.0)
            if stopper is not None and stopper(epoch, fitness):
                print(f"early stop at epoch {epoch} (best {stopper.best_fitness:.4f})")
                break

        if checkpoint_path:
            params_out = ema.params if ema is not None else state.params
            save_params(checkpoint_path, jax.device_get(params_out), {"epoch": epoch})

    if ema is not None:
        state = state._replace(params=ema.params)
    return state
