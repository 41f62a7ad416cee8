#!/usr/bin/env python
"""Micro A/B of the fused in-kernel slot->chunk lookup+fetch
(pallas_lookup_fetch) against its two-piece baseline (XLA merge-by-sort
lookup + pallas_row_fetch) at the eval config (batch 128 via vmap,
nc=2565 chunks, k=4096 slots)."""
import time
import sys
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from yolort_tpu.ops.pallas.lookup_kernel import (
    pallas_lookup_fetch,
    pallas_row_fetch,
)

B, NC, K = 128, 2565, 4096
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.standard_normal((B, NC, 128)).astype(np.float32))
# realistic off: ~4500 survivors spread over the gt tier, sparse eq tier
cnt_gt = rng.integers(0, 4, (B, NC)).astype(np.int32)
cnt_eq = np.zeros((B, NC), np.int32)
cnt_eq[:, rng.integers(0, NC, 4)] = 1
cnt = np.concatenate([cnt_gt, cnt_eq], axis=1)
off = jnp.asarray(np.cumsum(cnt, axis=1) - cnt)
phys = jnp.asarray(rng.integers(0, NC, (B, K)).astype(np.int32))
phys_sorted = jnp.sort(phys, axis=1)

_RTT = 0.0


def timed(label, f, *args):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(jf(*args))[0])
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(jf(*args))[0])
        ts.append(time.perf_counter() - t0)
    print(f"{label:56s} {max(min(ts) - _RTT, 0) * 1000:8.2f} ms"
          f" (compile {comp:.0f}s)", flush=True)


triv = jax.jit(lambda x: jnp.sum(x[0, 0, :4]))
np.asarray(triv(tab))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    np.asarray(triv(tab))
    ts.append(time.perf_counter() - t0)
_RTT = min(ts)
print(f"RTT {_RTT * 1000:.2f} ms", flush=True)

timed("fused lookup+fetch (kernel)",
      lambda t, o: jnp.sum(
          jax.vmap(lambda tt, oo: pallas_lookup_fetch(tt, oo, K)[0])(t, o)),
      tab, off)
timed("pallas_row_fetch alone (sorted phys)",
      lambda t, p: jnp.sum(
          jax.vmap(lambda tt, pp: pallas_row_fetch(tt, pp))(t, p)),
      tab, phys_sorted)
