#!/usr/bin/env python
"""TPU per-layer bf16 backbone timing vs each layer's HBM traffic floor.

VERDICT r3 item 3 names "bf16 conv-chain VMEM fusion" (bounded 3-5 ms) as
the last serving-ceiling lever.  Whether a fused Pallas chain can win
decomposes into two measurable questions:

  1. are XLA's bf16 convs already at their own (input+weights+output)
     traffic floors per layer?  If yes, fusion's entire upside is the
     *intermediate* activations it removes from HBM, bounded by
     bytes(intermediates)/BW; and
  2. can a Pallas conv match XLA's conv emitter on the remaining work?
     (the int8 qconv experiment answered NO by 3-6x per conv at exactly
     the early shapes fusion would target — ops/pallas/qconv.py,
     docs/PERF.md negative result 0)

This harness answers (1): cumulative-prefix timing over the backbone
layers (the same methodology as tools/profile_stages.py) next to an
analytic per-layer floor max(bytes/815 GB/s, FLOPs/197 TF/s).
"""
import time
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.utils import cast_floating

B, S = 128, 640
dtype = jnp.bfloat16
model = build_yolo("yolov5_darknet_pan_s_r60")
params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
bb = model.backbone
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32), dtype)

triv = jax.jit(lambda x: jnp.sum(x[0, 0, 0].astype(jnp.float32)))
float(triv(x))
ts = []
for _ in range(6):
    t0 = time.perf_counter(); float(triv(x)); ts.append(time.perf_counter() - t0)
RTT = min(ts)
print(f"RTT {RTT*1000:.2f} ms", flush=True)


def time_prefix(n_layers, iters=10):
    """Chained timing of backbone layers [0, n_layers), output consumed."""
    bp = params["backbone"]

    def prefix(p, x):
        def body(i, acc):
            y = x + (acc % 3).astype(x.dtype) * 1e-6
            for j in range(n_layers):
                y = bb.layers[j](p[str(j)], y)
            return acc + jnp.sum(y[..., 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    jf = jax.jit(prefix)
    float(jf(bp, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(jf(bp, x))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0) / iters * 1000.0


def leaf_convs(node):
    """(kh, kw, cin_g, cout) shapes of every conv leaf under node."""
    out = []
    if isinstance(node, dict):
        if "w" in node and not isinstance(node["w"], dict) and getattr(node["w"], "ndim", 0) == 4:
            out.append(tuple(node["w"].shape))
        else:
            for v in node.values():
                out.extend(leaf_convs(v))
    return out


# analytic floor per layer: traffic = batch * (in + out + intermediates)
# bytes + weights; FLOPs from conv shapes at the layer's output extent
HBM_BW = 815e9
PEAK = 197e12

prev_ms = 0.0
h = w = S
cin = 3
print(f"{'layer':28s} {'Δms':>8s} {'floor_ms':>9s} {'x_floor':>8s}", flush=True)
for i, layer in enumerate(bb.layers):
    name = type(layer).__name__
    s = getattr(layer, "s", 1)
    if name == "Conv" and s == 2:
        h, w = h // 2, w // 2
    if name == "Focus":
        h, w = h // 2, w // 2
    cout = getattr(layer, "c2", cin)
    convs = leaf_convs(params["backbone"][str(i)])
    flops = 0.0
    traffic = 0.0
    # io tensors of the layer
    traffic += B * (h * w * 2) * (cin + cout)  # in once, out once (bf16)
    # every internal conv's output is an intermediate written+read once
    for (kh, kw_, cg, co) in convs:
        flops += 2.0 * B * h * w * kh * kw_ * cg * co
        traffic += 2 * B * h * w * co * 2  # bf16 write+read
        traffic += kh * kw_ * cg * co * 2
    floor = max(traffic / HBM_BW, flops / PEAK) * 1000.0
    cur = time_prefix(i + 1)
    d = cur - prev_ms
    prev_ms = cur
    print(f"{i}:{name:26s} {d:8.2f} {floor:9.3f} {d / max(floor, 1e-6):8.2f}",
          flush=True)
    cin = cout
print(f"total backbone {prev_ms:.2f} ms", flush=True)
