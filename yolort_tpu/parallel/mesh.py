"""Multi-chip scaling via jax.sharding — the TPU-native replacement for the
reference's torch.distributed usage.

The reference's distributed story (SURVEY.md §2.10) is: Lightning-owned DDP
for training, pickle-based all_gather for eval merging
(yolort/data/distributed.py:6), and an explicit "multi-GPU inference not
supported" (tools/eval_metric.py:109).  Here multi-chip batch inference and
training are first-class: computation follows sharding — batches are sharded
over a 1-D 'data' mesh axis, params are replicated, and XLA inserts the
gradient all-reduce over ICI automatically.

A 'model' axis is reserved in the mesh for tensor-parallel layouts; YOLOv5s
(~7M params) does not need TP, so it defaults to size 1.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """1-D (data) or 2-D (data, model) device mesh."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    assert n % model_axis == 0, f"{n} devices not divisible by model axis {model_axis}"
    grid = devices.reshape(n // model_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis over the 'data' mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, sharding)


def data_parallel_infer(model, mesh: Mesh):
    """jit-compiled batch-sharded inference: (params, images) -> Detections.

    images' leading axis must divide the data-axis size.  This is the
    multi-chip batch inference the reference explicitly does not support
    (tools/eval_metric.py:109 raises NotImplementedError)."""
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    from yolort_tpu.utils.compile_options import tpu_compiler_options

    return jax.jit(
        lambda params, images: model(params, images),
        in_shardings=(repl, batch_sharding),
        out_shardings=batch_sharding,
        compiler_options=tpu_compiler_options(),
    )


def data_parallel_train_step(task, mesh: Mesh):
    """jit-compiled data-parallel train step over the mesh.

    Params/opt-state replicated, images sharded on 'data'; XLA inserts the
    gradient psum over ICI (replaces DDP all-reduce)."""
    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data"))

    from yolort_tpu.utils.compile_options import tpu_compiler_options

    return jax.jit(
        task.train_step,
        in_shardings=(repl, batch_sharding, batch_sharding, batch_sharding),
        out_shardings=(repl, repl),
        compiler_options=tpu_compiler_options(),
    )
