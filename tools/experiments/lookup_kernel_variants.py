#!/usr/bin/env python
"""Cost decomposition of the fused lookup+fetch kernel: times stripped
variants (full-rows-only lookup / no meta write / no fetch / fetch only)
to locate where the per-block microseconds go.  Results feed the design
of _lookup_fetch_kernel (docs/PERF.md)."""
import functools
import time
import sys
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolort_tpu.ops.pallas.lookup_kernel import (
    _fetch_block_bits,
    byte_planes,
    _W, _SB, _RB,
)

B, NC, K = 128, 2565, 4096
M2 = 2 * NC
rng = np.random.default_rng(0)
tab_np = rng.standard_normal((B, NC, 128)).astype(np.float32)
cnt_gt = rng.integers(0, 4, (B, NC)).astype(np.int32)
cnt_eq = np.zeros((B, NC), np.int32)
cnt_eq[:, rng.integers(0, NC, 4)] = 1
cnt = np.concatenate([cnt_gt, cnt_eq], axis=1)
off_np = np.cumsum(cnt, axis=1) - cnt

mp = -(-NC // _RB) * _RB
m2p = -(-M2 // _W) * _W


def make_kernel(do_boundary, do_meta, do_fetch, do_lookup=True):
    def kern(off_ref, rowmax_ref, planes_ref, out_ref, meta_ref,
             acc_ref, cnt_ref, omax_ref):
        n_off_rows = off_ref.shape[0]
        nrb = mp // _RB
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
        rowmax = rowmax_ref[:, :]
        for sb in range(K // _SB):
            s = sb * _SB + jax.lax.broadcasted_iota(jnp.int32, (_SB, 1), 0)
            if do_lookup:
                full = rowmax <= s
                br = jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True)
                cnt_ref[:, :] = br * _W
                omax_ref[:, :] = jnp.max(jnp.where(full, rowmax, 0), axis=1,
                                         keepdims=True)
                if do_boundary:
                    br_lo = jnp.min(br)
                    br_hi = jnp.max(br)
                    for rb in range(n_off_rows):
                        @pl.when(jnp.logical_and(br_lo <= rb, rb <= br_hi))
                        def _visit(rb=rb):
                            row = off_ref[rb:rb + 1, :]
                            mine = br == rb
                            le = jnp.logical_and(row <= s, mine)
                            cnt_ref[:, :] += jnp.sum(
                                le.astype(jnp.int32), axis=1, keepdims=True)
                            omax_ref[:, :] = jnp.maximum(
                                omax_ref[:, :],
                                jnp.max(jnp.where(le, row, 0), axis=1,
                                        keepdims=True))
                c = jnp.clip(cnt_ref[:, :] - 1, 0, M2 - 1)
                is_eq = (c >= NC).astype(jnp.int32)
                phys = c - is_eq * NC
                p = s - omax_ref[:, :]
            else:
                phys = jnp.minimum(s // 2, NC - 1)
                p = s - phys
                is_eq = jnp.zeros_like(s)
            if do_meta:
                meta_ref[pl.ds(sb * _SB, _SB), :] = jnp.where(
                    iota_l == 0, phys,
                    jnp.where(iota_l == 1, p,
                              jnp.where(iota_l == 2, is_eq, 0)))
            else:
                meta_ref[pl.ds(sb * _SB, _SB), :] = jnp.broadcast_to(
                    phys, (_SB, _W))
            if do_fetch:
                out_ref[pl.ds(sb * _SB, _SB), :] = _fetch_block_bits(
                    phys, planes_ref, acc_ref, nrb, iota_l, 4)
            else:
                out_ref[pl.ds(sb * _SB, _SB), :] = jnp.broadcast_to(
                    phys, (_SB, _W))
    return kern


def run_variant(name, **kw):
    kern = make_kernel(**kw)

    @jax.jit
    def f(tabs, offs):
        def one(tab, off):
            tabp = jnp.pad(tab, ((0, mp - NC), (0, 0)))
            planes = byte_planes(jax.lax.bitcast_convert_type(tabp, jnp.int32))
            offp = jnp.concatenate(
                [off, jnp.full((m2p - M2,), jnp.int32(2**30))])
            offp = offp.reshape(m2p // _W, _W)
            rowmax = jnp.full((1, _W), jnp.int32(2**30))
            rowmax = jax.lax.dynamic_update_slice(
                rowmax, jnp.max(offp, axis=1)[None, :], (0, 0))
            bits, meta = pl.pallas_call(
                kern,
                out_shape=[
                    jax.ShapeDtypeStruct((K, _W), jnp.int32),
                    jax.ShapeDtypeStruct((K, _W), jnp.int32),
                ],
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                scratch_shapes=[
                    pltpu.VMEM((_SB, 4 * _W), jnp.int32),
                    pltpu.VMEM((_SB, 1), jnp.int32),
                    pltpu.VMEM((_SB, 1), jnp.int32),
                ],
            )(offp, rowmax, planes)
            return jnp.sum(bits) + jnp.sum(meta)
        return jnp.sum(jax.vmap(one)(tabs, offs))

    tabs = jnp.asarray(tab_np)
    offs = jnp.asarray(off_np)
    t0 = time.perf_counter()
    np.asarray(f(tabs, offs))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f(tabs, offs))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {max(min(ts) - RTT, 0) * 1000:8.2f} ms"
          f" (compile {comp:.0f}s)", flush=True)


triv = jax.jit(lambda x: jnp.sum(x[0, 0, :4]))
x0 = jnp.asarray(tab_np)
np.asarray(triv(x0))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    np.asarray(triv(x0))
    ts.append(time.perf_counter() - t0)
RTT = min(ts)
print(f"RTT {RTT * 1000:.2f} ms", flush=True)

run_variant("full (lookup+boundary+meta+fetch)",
            do_boundary=True, do_meta=True, do_fetch=True)
run_variant("no boundary loop", do_boundary=False, do_meta=True, do_fetch=True)
run_variant("no fetch", do_boundary=True, do_meta=True, do_fetch=False)
run_variant("no lookup (fetch only, synth phys)",
            do_lookup=False, do_boundary=False, do_meta=False, do_fetch=True)
run_variant("lookup only, no meta/fetch",
            do_boundary=True, do_meta=False, do_fetch=False)
