"""Training task: loss + optimizer + jittable train step.

Re-design of the reference's Lightning ``DefaultTask``
(yolort/trainer/lightning_task.py:29).  Lightning's imperative loop becomes a
pure ``train_step(state, batch) -> (state, metrics)`` suitable for jit/pjit;
distributed data-parallelism is expressed with shardings (see
yolort_tpu.parallel), not a Strategy object.

Optimizer defaults match lightning_task.py:111-117: SGD(lr=0.01,
momentum=0.9, weight_decay=5e-4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from yolort_tpu.models.losses import YOLOLoss
from yolort_tpu.models.yolo import YOLO
from yolort_tpu.ops.blocks import Params


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jax.Array


@dataclass(frozen=True)
class DefaultTask:
    """Bundles a model spec, its loss, and an optimizer.

    With ``total_steps`` set, the LR follows linear warmup + one-cycle
    cosine decay to ``lr * final_lr_frac`` (the reference's one_cycle
    schedule, v5/utils/general.py:328 + hyp.scratch.yaml lrf)."""

    model: YOLO
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 5e-4
    total_steps: Optional[int] = None
    warmup_steps: int = 0
    final_lr_frac: float = 0.1
    # hyp dict (trainer.hyp.DEFAULT_HYP schema) — when set, drives the
    # optimizer (lr0/lrf/momentum/weight_decay) and every loss gain, the way
    # the reference's hyp yaml drives its vendored ComputeLoss
    # (v5/utils/loss.py:104-124)
    hyp: Optional[Dict] = None

    def __post_init__(self):
        loss_kw = {}
        if self.hyp is not None:
            h = self.hyp
            object.__setattr__(self, "lr", float(h.get("lr0", self.lr)))
            object.__setattr__(self, "momentum", float(h.get("momentum", self.momentum)))
            object.__setattr__(
                self, "weight_decay", float(h.get("weight_decay", self.weight_decay))
            )
            object.__setattr__(
                self, "final_lr_frac", float(h.get("lrf", self.final_lr_frac))
            )
            loss_kw = dict(
                box_gain=float(h.get("box", 0.05)),
                cls_gain=float(h.get("cls", 0.5)),
                obj_gain=float(h.get("obj", 1.0)),
                cls_pos=float(h.get("cls_pw", 1.0)),
                obj_pos=float(h.get("obj_pw", 1.0)),
                anchor_thresh=float(h.get("anchor_t", 4.0)),
                fl_gamma=float(h.get("fl_gamma", 0.0)),
                label_smoothing=float(h.get("label_smoothing", 0.0)),
            )
        loss = YOLOLoss(
            strides=self.model.strides,
            anchor_grids=self.model.anchor_grids,
            num_classes=self.model.num_classes,
            **loss_kw,
        )
        if self.total_steps:
            from yolort_tpu.trainer.utils import one_cycle_schedule

            lr = one_cycle_schedule(
                self.lr, self.final_lr_frac, self.total_steps, self.warmup_steps
            )
        else:
            lr = self.lr
        tx = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.sgd(lr, momentum=self.momentum),
        )
        object.__setattr__(self, "loss", loss)
        object.__setattr__(self, "tx", tx)

    def init_state(self, key) -> TrainState:
        params = self.model.init(key)
        return TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(self, params: Params, images, targets, target_mask) -> Tuple[jax.Array, Dict]:
        outs = self.model.head_outputs(params, images)
        losses = self.loss(outs, targets, target_mask)
        total = losses["cls_logits"] + losses["bbox_regression"] + losses["objectness"]
        return total, losses

    def train_step(self, state: TrainState, images, targets, target_mask):
        """One SGD step. images (B,H,W,3) letterboxed; targets (B,T,5)
        [cls,cxcywh-normalized] padded per image; target_mask (B,T)."""
        (total, losses), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, images, targets, target_mask
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses, total=total)
        return TrainState(params, opt_state, state.step + 1), metrics


def make_train_step(task: DefaultTask):
    """Returns the jitted single-device train step."""
    from yolort_tpu.utils.compile_options import tpu_compiler_options

    return jax.jit(task.train_step, compiler_options=tpu_compiler_options())
