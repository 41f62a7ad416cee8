"""Small shared utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype`` (the bf16 analog of
    the reference's .half() deployment cast, _checkpoint.py:81)."""

    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
