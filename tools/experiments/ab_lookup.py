#!/usr/bin/env python
"""TPU A/B: pallas_row_fetch vs XLA gather (micro) + e2e cells postprocess
with pallas gathers (batch 128, eval config)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
import sys
from functools import partial
sys.path.insert(0, "/root/repo")
from yolort_tpu.ops.pallas.lookup_kernel import pallas_row_fetch
from yolort_tpu.ops.nms import batched_postprocess_from_heads

B = 128
rng = np.random.default_rng(0)
_RTT = 0.0

def timed(label, f, *args):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    np.asarray(jf(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {max(min(ts)-_RTT,0)*1000:8.2f} ms (compile {comp:.0f}s)",
          flush=True)

x0 = jnp.zeros((B, 8), jnp.float32)
triv = jax.jit(lambda x: jnp.sum(x))
np.asarray(triv(x0))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    np.asarray(triv(x0))
    ts.append(time.perf_counter() - t0)
_RTT = min(ts)
print(f"RTT {_RTT*1000:.2f} ms", flush=True)

# --- micro: stage-2-shaped fetch (m=2565, w=128, k=4096, sorted phys) ------
m, w, k = 2565, 128, 4096
tab = jnp.asarray(rng.standard_normal((B, m, w)).astype(np.float32))
phys_sorted = jnp.sort(
    jnp.asarray(rng.integers(0, m, (B, k), dtype=np.int32)), axis=1)
phys_rand = jnp.asarray(rng.integers(0, m, (B, k), dtype=np.int32))

def g_xla(tab, ph):
    return jnp.sum(jax.vmap(lambda t, i: t[i])(tab, ph))

def g_pal(tab, ph):
    return jnp.sum(jax.vmap(lambda t, i: pallas_row_fetch(t, i))(tab, ph))

timed("micro xla gather m=2565 w=128 k=4096", g_xla, tab, phys_sorted)
timed("micro pallas fetch (sorted phys)", g_pal, tab, phys_sorted)
timed("micro pallas fetch (random phys)", g_pal, tab, phys_rand)

# box-shaped: m=4104, w=4
tb = jnp.asarray(rng.standard_normal((B, 4104, 4)).astype(np.float32))
pb = jnp.asarray(rng.integers(0, 4104, (B, k), dtype=np.int32))
timed("micro xla gather m=4104 w=4", g_xla, tb, pb)
timed("micro pallas fetch w=4 (random)", g_pal, tb, pb)

# cells-shaped: m=8400, w=255 bf16, piecewise-sorted indices
tc = jnp.asarray(rng.standard_normal((B, 8400, 255)).astype(np.float32)).astype(jnp.bfloat16)
pc = jnp.sort(jnp.asarray(rng.integers(0, 8400, (B, 4104), dtype=np.int32)), axis=1)
def gc_xla(tab, ph):
    return jnp.sum(jax.vmap(lambda t, i: t[i])(tab, ph).astype(jnp.float32))
def gc_pal(tab, ph):
    return jnp.sum(jax.vmap(lambda t, i: pallas_row_fetch(t, i))(tab, ph).astype(jnp.float32))
timed("micro xla gather m=8400 w=255 bf16 sorted", gc_xla, tc, pc)
timed("micro pallas fetch w=255 bf16 (sorted)", gc_pal, tc, pc)

# --- e2e postprocess ---------------------------------------------------------
nc, na = 80, 3
grids = [(80, 80), (40, 40), (20, 20)]
strides = (8, 16, 32)
anchor_grids = (
    (10.0, 13.0, 16.0, 30.0, 33.0, 23.0),
    (30.0, 61.0, 62.0, 45.0, 59.0, 119.0),
    (116.0, 90.0, 156.0, 198.0, 373.0, 326.0),
)
heads = []
for h, ww in grids:
    x = rng.standard_normal((B, h, ww, na * (5 + nc))).astype(np.float32) * 2.0 - 6.0
    x = x.reshape(B, h, ww, na, 5 + nc)
    x[..., 4] += 3.0
    heads.append(jnp.asarray(x.reshape(B, h, ww, na * (5 + nc))))
kw = dict(num_classes=nc, score_thresh=0.005, nms_thresh=0.45,
          detections_per_img=300, pre_nms_topk=4096, topk_impl="bisect")

res = {}
for label, extra in [
    # row_gather pinned to 'xla' explicitly: the shipping auto default is
    # now 'pallas_bisect' on TPU, which would silently turn this baseline
    # into the kernel hybrid and collapse the headline delta (advisor r3)
    ("e2e cells + xla gathers", dict(flatten_pad="cell", row_gather="xla")),
    ("e2e cells + pallas row_gather", dict(flatten_pad="cell", row_gather="pallas")),
    ("e2e cells + pallas row+box", dict(flatten_pad="cell", row_gather="pallas",
                                        box_gather="pallas")),
    ("e2e cells + pallas_select", dict(flatten_pad="cell",
                                       row_gather="pallas_select")),
    ("e2e cells + pallas_select+box", dict(flatten_pad="cell",
                                           row_gather="pallas_select",
                                           box_gather="pallas")),
    ("e2e cells + pallas_full", dict(flatten_pad="cell",
                                     row_gather="pallas_full")),
    ("e2e cells + pallas_full+box", dict(flatten_pad="cell",
                                         row_gather="pallas_full",
                                         box_gather="pallas")),
    ("e2e cells + pallas_bisect (hybrid)", dict(flatten_pad="cell",
                                                row_gather="pallas_bisect")),
    ("e2e cells + pallas_lookup (fused)", dict(flatten_pad="cell",
                                               row_gather="pallas_lookup")),
    ("e2e cells + pallas_bisect+box", dict(flatten_pad="cell",
                                           row_gather="pallas_bisect",
                                           box_gather="pallas")),
    ("e2e cells + pallas cellfetch", dict(flatten_pad="cell",
                                          row_gather="xla",
                                          cell_gather="pallas")),
    ("e2e cells + ALL pallas", dict(flatten_pad="cell",
                                    row_gather="pallas_full",
                                    box_gather="pallas",
                                    cell_gather="pallas")),
]:
    f = jax.jit(partial(batched_postprocess_from_heads, strides=strides,
                        anchor_grids=anchor_grids, **kw, **extra))
    try:
        t0 = time.perf_counter()
        r = f(heads); np.asarray(r.num)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = f(heads); np.asarray(r.num)
            ts.append(time.perf_counter() - t0)
    except Exception as e:  # keep measuring the remaining configs
        print(f"{label:52s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    print(f"{label:52s} {max(min(ts)-_RTT,0)*1000:8.2f} ms (compile {comp:.0f}s)",
          flush=True)
    res[label] = r

ref = res.get("e2e cells + xla gathers")
if ref is None:
    print("baseline config failed; skipping the parity check", flush=True)
else:
    for label, r in res.items():
        for fa, fb, name in zip(r, ref, r._fields):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                          err_msg=f"{label}:{name}")
    print("e2e parity: bit-identical on hardware", flush=True)
