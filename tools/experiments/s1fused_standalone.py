#!/usr/bin/env python
"""Standalone timing: Pallas fused concat+stage-1 vs the XLA formulation.

The e2e A/B (s1fused.py) measured the kernel NEGATIVE (serving 3668.5 vs
3918.1 imgs/s; eval 2143.4 vs 2211.9).  This probe separates the two
possible causes:
  (a) the kernel is slower than XLA's concat+reduce even in isolation, or
  (b) the kernel wins in isolation but the e2e loses because XLA fuses the
      in-path stage-1 into the head-conv epilogues (a fusion-boundary
      negative, same shape as the qconv band result).
Times just the concat+stage-1 computation over materialized head-output
levels, chained (run N times inside a fori_loop, consume a scalar).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("YOLORT_JAX_CACHE", "/tmp/yolort_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import time

import jax.numpy as jnp
import numpy as np

from yolort_tpu.ops.nms import _stage1_per_anchor
from yolort_tpu.ops.pallas.s1_kernel import fused_cells_stage1


def chained_ms(fn, args, iters=50, repeat=5):
    """Chained timing with three fairness guards: (1) each iteration's
    inputs depend on the previous accumulator (no loop hoisting; costs one
    identical add-pass for every variant — the reported numbers all carry
    it), (2) outputs pass through an optimization_barrier so the full cells
    table must materialize (XLA would otherwise fuse the concat into the
    tiny consumer slice and skip the 548 MB write the kernel always pays),
    (3) only single elements are read after the barrier."""
    dtype = args[0].dtype

    def body_with(xs):
        def body(i, acc):
            jit = (acc % 3.0).astype(dtype) * 1e-6
            outs = fn(*[a + jit for a in xs])
            outs = jax.lax.optimization_barrier(outs)
            leaves = jax.tree_util.tree_leaves(outs)
            return acc + sum(l.reshape(-1)[0].astype(jnp.float32) for l in leaves)
        return body

    # levels are jit ARGUMENTS, not closure constants — closing over the
    # 548 MB table embeds it in the compile payload (the axon relay
    # rejects the request with HTTP 413)
    run = jax.jit(lambda xs: jax.lax.fori_loop(
        0, iters, body_with(xs), jnp.float32(0.0)))
    run(args).block_until_ready()
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        run(args).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    A, kw = 3, 5 + args.nc
    s = args.size
    grids = [(s // 8, s // 8), (s // 16, s // 16), (s // 32, s // 32)]
    rng = np.random.default_rng(0)
    levels = [
        jnp.asarray(rng.normal(0, 2.5, (args.batch, h * w, A * kw)).astype(np.float32),
                    dtype=jnp.bfloat16)
        for h, w in grids
    ]

    def xla_inpath(*lv):
        cells = jnp.concatenate(lv, axis=1)
        per = jax.vmap(lambda c: _stage1_per_anchor(c, A, kw).reshape(-1))(cells)
        return cells, per

    def xla_precat(*lv):
        cells = jnp.concatenate(lv, axis=1)
        per = jnp.concatenate(
            [_stage1_per_anchor(l, A, kw) for l in lv], axis=1
        ).reshape(cells.shape[0], -1)
        return cells, per

    def fused(*lv):
        return fused_cells_stage1(list(lv), A, kw)

    # parity first
    ca, pa = jax.jit(xla_inpath)(*levels)
    cf, pf = jax.jit(fused)(*levels)
    assert bool(jnp.all(ca == cf)) and bool(jnp.all(pa == pf)), "parity"
    print("parity ok", flush=True)

    def baseline(*lv):
        # jitter-add pass + loop overhead only: subtract from the rows below
        return lv

    for name, fn in (("baseline", baseline),
                     ("xla in-path", xla_inpath), ("xla precat", xla_precat),
                     ("pallas fused", fused)):
        ms = chained_ms(fn, levels, args.iters)
        print(f"{name:14s} {ms:7.3f} ms", flush=True)

    # traffic floor for context
    table_mb = sum(l.size * l.dtype.itemsize for l in levels) / 1e6
    print(f"(one read+write pass of the {table_mb:.0f} MB table at 815 GB/s "
          f"= {2 * table_mb / 815:.2f} ms)")


if __name__ == "__main__":
    main()
