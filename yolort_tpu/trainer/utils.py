"""Training utilities: EMA, early stopping, LR schedules.

Capability parity with the reference's ModelEMA (v5/utils/torch_utils.py:339),
EarlyStopping (:312) and one_cycle schedule (v5/utils/general.py:328) — as
pure pytree/optax constructs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass
class ModelEMA:
    """Exponential moving average over a params pytree.

    Decay ramps like the reference: d = decay * (1 - exp(-updates/tau))."""

    decay: float = 0.9999
    tau: float = 2000.0
    updates: int = 0
    params: Optional[dict] = None

    def update(self, new_params) -> dict:
        self.updates += 1
        d = self.decay * (1 - math.exp(-self.updates / self.tau))
        if self.params is None:
            self.params = jax.tree_util.tree_map(jnp.asarray, new_params)
        else:
            self.params = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), self.params, new_params
            )
        return self.params


@dataclass
class EarlyStopping:
    """Stop when fitness hasn't improved for ``patience`` epochs."""

    patience: int = 30
    best_fitness: float = 0.0
    best_epoch: int = 0

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal one-cycle ramp y1->y2 (reference general.py:328)."""

    def fn(x):
        return ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1

    return fn


def one_cycle_schedule(base_lr: float, final_lr_frac: float, total_steps: int,
                       warmup_steps: int = 0):
    """optax-compatible schedule: linear warmup then one-cycle cosine decay
    from base_lr to base_lr*final_lr_frac."""
    cyc = one_cycle(1.0, final_lr_frac, max(total_steps - warmup_steps, 1))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        x = jnp.clip(step - warmup_steps, 0, None)
        decay = base_lr * (
            (1 - jnp.cos(x * math.pi / max(total_steps - warmup_steps, 1))) / 2
            * (final_lr_frac - 1.0)
            + 1.0
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule
