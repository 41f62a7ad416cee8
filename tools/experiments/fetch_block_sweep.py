#!/usr/bin/env python
"""TPU sweep: fetch-kernel block sizes (_SB slots/block x _RB rows/block).

Hypothesis (round 4): the in-VMEM fetch kernel's cost is dominated by
per-(row-block x column-group) iteration overhead (acc RMW + loop/predication),
not MXU MACs — measured ~1 us/image/block at the r3 defaults (SB=512,
RB=128), which matches both the 3.5 ms stage-2 fetch (28 block-units) and
the 18.5 ms cells fetch (~150 block-units).  If true, larger RB cuts
iterations (and total acc traffic) at constant MAC count, and the cells
fetch becomes viable.

Runs a local parametrized copy of the kernel (production defaults
untouched); shapes = the two production fetches at the eval config
(batch 128): stage-2 chunks (2565, 128) f32 sorted idx, cells (8400, 255)
bf16 piecewise-sorted idx.  Parity asserted per config.
"""
import sys
import time
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from yolort_tpu.ops.pallas.lookup_kernel import byte_planes

B = 128
_W = 128


def _fetch_kernel_p(phys_ref, planes_ref, out_ref, acc_ref, *, k, m, nbytes,
                    sb, rb):
    nrb = m // rb
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)

    for s in range(k // sb):
        phys = phys_ref[pl.ds(s * sb, sb), :]  # (sb, 1) i32
        lo = jnp.min(phys)
        hi = jnp.max(phys)
        acc_ref[:, :] = jnp.zeros((sb, nbytes * _W), jnp.int32)

        def body(r, _):
            # one-hot over an rb-wide row block: rb/_W sub-tiles of 128
            for sub in range(rb // _W):
                onehot = (phys == iota_l + r * rb + sub * _W).astype(jnp.int8)
                blk = planes_ref[pl.ds(r * rb + sub * _W, _W), :]
                acc_ref[:, :] += jax.lax.dot_general(
                    onehot, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            return 0

        r0 = jnp.clip(lo // rb, 0, nrb - 1)
        r1 = jnp.clip(hi // rb + 1, 1, nrb)
        jax.lax.fori_loop(r0, r1, body, 0)

        bits = jnp.zeros((sb, _W), jnp.int32)
        for i in range(nbytes):
            byte = acc_ref[:, i * _W:(i + 1) * _W] + 128
            bits = bits + (byte << (8 * i))
        out_ref[pl.ds(s * sb, sb), :] = bits


def row_fetch_p(table, phys, sb=512, rb=128):
    m, w = table.shape
    k = phys.shape[0]
    mp = -(-m // rb) * rb
    kp = -(-k // sb) * sb
    wp = -(-w // _W) * _W
    bf16 = table.dtype == jnp.bfloat16
    nbytes = 2 if bf16 else 4
    tab = table if bf16 else table.astype(jnp.float32)
    if wp > w or mp > m:
        tab = jnp.pad(tab, ((0, mp - m), (0, wp - w)))
    ibits = jax.lax.bitcast_convert_type(tab, jnp.int16 if bf16 else jnp.int32)
    ph = jnp.clip(phys.astype(jnp.int32), 0, m - 1)
    if kp > k:
        ph = jnp.concatenate([ph, jnp.zeros((kp - k,), jnp.int32)])
    ph = ph.reshape(kp, 1)
    cols = []
    for c in range(0, wp, _W):
        planes = byte_planes(ibits[:, c:c + _W], nbytes)
        out = pl.pallas_call(
            partial(_fetch_kernel_p, k=kp, m=mp, nbytes=nbytes, sb=sb, rb=rb),
            out_shape=jax.ShapeDtypeStruct((kp, _W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((sb, nbytes * _W), jnp.int32)],
        )(ph, planes)
        cols.append(out)
    bits_out = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    if bf16:
        rows = jax.lax.bitcast_convert_type(
            bits_out.astype(jnp.uint16).astype(jnp.int16), jnp.bfloat16
        )
    else:
        rows = jax.lax.bitcast_convert_type(bits_out, jnp.float32)
    return rows[:k]


def timed(label, f, *args):
    jf = jax.jit(f)
    try:
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(jf(*args))
            ts.append(time.perf_counter() - t0)
    except Exception as e:
        print(f"{label:46s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    print(f"{label:46s} {max(min(ts)-_RTT,0)*1000:8.2f} ms (compile {comp:.0f}s)",
          flush=True)
    return min(ts)


x0 = jnp.zeros((B, 8), jnp.float32)
triv = jax.jit(lambda x: jnp.sum(x))
np.asarray(triv(x0))
rtts = []
for _ in range(7):
    t0 = time.perf_counter()
    np.asarray(triv(x0))
    rtts.append(time.perf_counter() - t0)
_RTT = sorted(rtts)[3]
print(f"RTT ~{_RTT*1000:.1f} ms", flush=True)

rng = np.random.default_rng(0)

# shape 1: stage-2 chunk fetch — (2565, 128) f32, k=4096 sorted
m1, k1 = 2565, 4096
tab1 = jnp.asarray(rng.standard_normal((B, m1, _W)).astype(np.float32))
idx1 = jnp.asarray(np.sort(rng.integers(0, m1, (B, k1)), axis=1).astype(np.int32))

# shape 2: cells fetch — (8400, 255) bf16, k=4104 piecewise sorted (two tiers)
m2, k2 = 8400, 4104
tab2 = jnp.asarray(
    rng.standard_normal((B, m2, 255)).astype(np.float32)
).astype(jnp.bfloat16)
a = np.sort(rng.integers(0, m2, (B, 3500)), axis=1)
b = np.sort(rng.integers(0, m2, (B, k2 - 3500)), axis=1)
idx2 = jnp.asarray(np.concatenate([a, b], axis=1).astype(np.int32))

print("\n-- stage-2 chunk fetch (2565,128) f32 k=4096 sorted, batch 128 --",
      flush=True)
timed("xla gather", lambda t, i: jnp.sum(jax.vmap(lambda tt, ii: tt[ii])(t, i)),
      tab1, idx1)
ref = None
for sb in (512, 1024):
    for rb in (128, 256, 512, 1024):
        f = lambda t, i, sb=sb, rb=rb: jnp.sum(
            jax.vmap(lambda tt, ii: row_fetch_p(tt, ii, sb=sb, rb=rb))(t, i))
        timed(f"kernel sb={sb} rb={rb}", f, tab1, idx1)

# parity for one non-default config
pa = jax.jit(jax.vmap(lambda tt, ii: row_fetch_p(tt, ii, sb=1024, rb=512)))(tab1, idx1)
pb = jax.jit(jax.vmap(lambda tt, ii: tt[ii]))(tab1, idx1)
np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
print("parity sb=1024 rb=512: bit-exact", flush=True)

print("\n-- cells fetch (8400,255) bf16 k=4104 piecewise-sorted, batch 128 --",
      flush=True)
timed("xla gather", lambda t, i: jnp.sum(jax.vmap(lambda tt, ii: tt[ii])(t, i)
                                         .astype(jnp.float32)),
      tab2, idx2)
for sb in (512, 1024):
    for rb in (128, 256, 512, 1024):
        f = lambda t, i, sb=sb, rb=rb: jnp.sum(
            jax.vmap(lambda tt, ii: row_fetch_p(tt, ii, sb=sb, rb=rb))(t, i)
            .astype(jnp.float32))
        timed(f"kernel sb={sb} rb={rb}", f, tab2, idx2)

pa = jax.jit(jax.vmap(lambda tt, ii: row_fetch_p(tt, ii, sb=1024, rb=512)))(tab2, idx2)
pb = jax.jit(jax.vmap(lambda tt, ii: tt[ii]))(tab2, idx2)
np.testing.assert_array_equal(np.asarray(pa)[:, :, :255], np.asarray(pb))
print("parity cells sb=1024 rb=512: bit-exact", flush=True)
