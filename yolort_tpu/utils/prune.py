"""Magnitude pruning utilities.

Capability parity with the reference's prune/sparsity helpers
(v5/utils/torch_utils.py:197-216): global-threshold magnitude pruning over
conv weights and sparsity reporting, as pure pytree transforms."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sparsity(params) -> float:
    """Global fraction of exactly-zero weights."""
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(x.size) for x in leaves)
    zeros = sum(int(jnp.sum(x == 0)) for x in leaves)
    return zeros / max(total, 1)


def prune(params, amount: float = 0.3) -> Dict:
    """Zero the smallest-magnitude ``amount`` fraction of each conv/linear
    weight ('w' leaves); biases and BN stats untouched."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and not isinstance(v, dict) and np.asarray(v).ndim >= 2:
                    arr = np.asarray(v)
                    thresh = np.quantile(np.abs(arr), amount)
                    out[k] = jnp.asarray(np.where(np.abs(arr) <= thresh, 0, arr))
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)
