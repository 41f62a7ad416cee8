#!/usr/bin/env python
"""TPU A/B: stage-1 per-anchor reduction formulation on the cell path.

Shipping form: 2A masked full-lane max-reductions over the (n_cells, A*kw)
cells table (obj lane + class segment per anchor).  Candidate: view each
row as (A, kw) and reduce axis -1 — one reduce + one slice, potentially
fewer HBM streams IF XLA fuses the non-tile-aligned reshape into the
reduction instead of materializing a relayout.  Bit-identical math either
way (same 80-value max, same obj lane).  YOLORT_S1_RESHAPE=1 selects the
candidate.

MEASURED OUTCOME (v5e, batch 128 eval config, 2026-08-18): the reshape
variant LOSES — 46.74 ms vs 43.76 ms shipping — the 255→3x85 lane-split
view materializes a relayout that costs more than the masked reductions
it removes (same conclusion as the narrow-segment gather, negative
result -3 in docs/PERF.md).  The env-gated variant was removed from
ops/nms.py after the measurement; this script records the methodology
(re-add the ~10-line variant under YOLORT_S1_RESHAPE to reproduce).
"""
import os
import time
import sys
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 128
rng = np.random.default_rng(0)
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

x0 = jnp.zeros((B, 8), jnp.float32)
triv = jax.jit(lambda x: jnp.sum(x))
np.asarray(triv(x0))
ts = []
for _ in range(6):
    t0 = time.perf_counter(); np.asarray(triv(x0)); ts.append(time.perf_counter() - t0)
RTT = min(ts)
print(f"RTT {RTT*1000:.2f} ms", flush=True)

res = {}
for label, env in [("e2e eval, masked stage-1 (shipping)", "0"),
                   ("e2e eval, reshape stage-1", "1")]:
    os.environ["YOLORT_S1_RESHAPE"] = env
    # re-import per env value is unnecessary: the env is read at trace time
    from yolort_tpu.ops.nms import batched_postprocess_from_heads
    f = jax.jit(partial(batched_postprocess_from_heads, **kwargs))
    t0 = time.perf_counter()
    r = f(heads); np.asarray(r.num)
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        r = f(heads); np.asarray(r.num)
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {max(min(ts)-RTT,0)*1000:8.2f} ms (compile {comp:.0f}s)",
          flush=True)
    res[label] = r
os.environ.pop("YOLORT_S1_RESHAPE", None)

a = res["e2e eval, masked stage-1 (shipping)"]
b = res["e2e eval, reshape stage-1"]
for fa, fb, name in zip(a, b, a._fields):
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb), err_msg=name)
print("parity: bit-identical on hardware", flush=True)
