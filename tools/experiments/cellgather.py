#!/usr/bin/env python
"""TPU A/B: cell-row gather variants for the cell-major eval path.

The k1=4104-row fetch from the (n_cells, A*kw) cells table is the eval
step's second-largest remaining cost (~11 ms at batch 128, docs/PERF.md
stage table).  Candidates:
  * 'xla'  — full 255-lane row gather + 3-way segment select (shipping)
  * 'seg'  — (1, kw)-slice gather of only the selected segment (3x fewer
             bytes per row, no select)
Micro rows measure the raw gather shapes; e2e rows run the full eval-config
postprocess with everything else pinned to the shipping hybrid.
"""
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

# --- micro: cells-shaped fetch (m=8400, w=255 bf16, k1=4104, sorted) --------
m, w, k1, kw, A = 8400, 255, 4104, 85, 3
tab = jnp.asarray(
    rng.standard_normal((B, m, w)).astype(np.float32)).astype(jnp.bfloat16)
cell_idx = jnp.sort(jnp.asarray(rng.integers(0, m, (B, k1), dtype=np.int32)), axis=1)
a_idx = jnp.asarray(rng.integers(0, A, (B, k1), dtype=np.int32))

def g_row(tab, ci, ai):
    def one(t, c, a):
        crows = t[c]
        segs = [crows[:, j * kw:(j + 1) * kw] for j in range(A)]
        sel = segs[-1]
        for j in range(A - 2, -1, -1):
            sel = jnp.where((a == j)[:, None], segs[j], sel)
        return sel
    return jnp.sum(jax.vmap(one)(tab, ci, ai).astype(jnp.float32))

def g_seg(tab, ci, ai):
    def one(t, c, a):
        return jax.vmap(
            lambda cc, ss: jax.lax.dynamic_slice(t, (cc, ss), (1, kw))[0]
        )(c, a * kw)
    return jnp.sum(jax.vmap(one)(tab, ci, ai).astype(jnp.float32))

timed("micro row gather 255w bf16 + 3-way select", g_row, tab, cell_idx, a_idx)
timed("micro seg gather (1,85)-slices bf16", g_seg, tab, cell_idx, a_idx)

# f32 variant (eval path tables are the head-conv dtype)
tab32 = tab.astype(jnp.float32)
timed("micro row gather 255w f32 + 3-way select", g_row, tab32, cell_idx, a_idx)
timed("micro seg gather (1,85)-slices f32", g_seg, tab32, cell_idx, a_idx)

# --- e2e eval-config postprocess --------------------------------------------
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
kwargs = dict(num_classes=nc, score_thresh=0.005, nms_thresh=0.45,
              detections_per_img=300, pre_nms_topk=4096, topk_impl="bisect",
              strides=strides, anchor_grids=anchor_grids, flatten_pad="cell")

res = {}
for label, extra in [
    ("e2e hybrid + xla cell gather (shipping)",
     dict(row_gather="pallas_bisect", cell_gather="xla")),
    ("e2e hybrid + seg cell gather",
     dict(row_gather="pallas_bisect", cell_gather="seg")),
    ("e2e all-xla + xla cell gather",
     dict(row_gather="xla", cell_gather="xla")),
    ("e2e all-xla + seg cell gather",
     dict(row_gather="xla", cell_gather="seg")),
]:
    f = jax.jit(partial(batched_postprocess_from_heads, **kwargs, **extra))
    try:
        t0 = time.perf_counter()
        r = f(heads); np.asarray(r.num)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = f(heads); np.asarray(r.num)
            ts.append(time.perf_counter() - t0)
    except Exception as e:
        print(f"{label:52s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    print(f"{label:52s} {max(min(ts)-_RTT,0)*1000:8.2f} ms (compile {comp:.0f}s)",
          flush=True)
    res[label] = r

ref = res.get("e2e hybrid + xla cell gather (shipping)")
if ref is None:
    print("baseline config failed; skipping the parity check", flush=True)
else:
    for label, r in res.items():
        for fa, fb, name in zip(r, ref, r._fields):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                          err_msg=f"{label}:{name}")
    print("e2e parity: bit-identical on hardware", flush=True)
