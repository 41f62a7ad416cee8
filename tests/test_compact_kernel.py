"""Pallas stream-compaction kernel (interpret mode): exact-top-k contract.

The kernel is a documented negative result for the selection hot path
(docs/PERF.md "Negative results" #4) — bit-exact but slower than the
gather formulation at batch 128 — so it is tested (contract must hold if
it is ever revived) but not wired into ops.nms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.ops.pallas.compact_kernel import compact_select


def _ref_select(flat, k, thr):
    masked = jnp.where(flat > thr, flat.astype(jnp.float32), -1.0)
    v, i = jax.lax.top_k(masked, k)
    ok = v > thr
    return jnp.where(ok, v, -1.0), jnp.where(ok, i, 0)


@pytest.mark.parametrize("dist", ["uniform", "sparse", "ties", "subthreshold"])
def test_compact_select_matches_masked_topk(dist):
    rng = np.random.default_rng(0)
    n, k, thr = 40960, 512, 0.005
    if dist == "uniform":
        x = rng.random(n, dtype=np.float32)
    elif dist == "sparse":
        x = rng.random(n, dtype=np.float32) * 0.004
        x[rng.choice(n, 50, replace=False)] = rng.random(50).astype(np.float32)
    elif dist == "ties":
        x = np.round(rng.random(n).astype(np.float32) * 20) / 20
    else:  # almost everything below threshold
        x = rng.random(n, dtype=np.float32) * 0.004
    xv = jnp.asarray(x)
    v1, i1 = compact_select(xv, k, thr, interpret=True)
    v0, i0 = _ref_select(xv, k, thr)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
