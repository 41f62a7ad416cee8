"""Cross-host synchronization for evaluation.

The reference implements a pickle-over-NCCL object all_gather
(yolort/data/distributed.py:6-49) to merge COCO evaluator shards, plus
dist-synced meters (utils/logger.py:32-43).  TPU-native equivalent: JAX
multihost utils over ICI/DCN when running multi-process, identity when
single-process.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every process.

    Single-process: returns [obj].  Multi-process: pads pickled bytes to the
    global max and exchanges via process_allgather (the jax analog of the
    reference's byte-tensor padding dance, data/distributed.py:20-48)."""
    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_size)
    out = []
    for i in range(gathered.shape[0]):
        n = int(sizes[i][0] if sizes.ndim > 1 else sizes[i])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def all_reduce_mean(value: float) -> float:
    """Average a scalar across processes (SmoothedValue sync analog)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value], np.float64))
    return float(np.mean(vals))
