#!/usr/bin/env python
"""Measure the int8 concat/add glue cost: time the int8 backbone+PAN+head
normally vs with _qconcat's rescale pass skipped (numerically WRONG, timing
only) and _qadd reduced to a raw add (also wrong).  Upper-bounds the win of
shared-scale calibration."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")

from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.utils import cast_floating
from yolort_tpu.ops.quantization import calibrate_activations, quantize_compute_params
from yolort_tpu.ops import blocks

B, S = 128, 640
dtype = jnp.bfloat16
model = build_yolo("yolov5_darknet_pan_s_r60")
params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (2, S, S, 3)).astype(np.float32), dtype)
pc = calibrate_activations(model.head_outputs, params, [x, x])
qp = quantize_compute_params(pc)
xb = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32), dtype)

_RTT = 0.0

def timed(label, f, *args):
    jf = jax.jit(f)
    np.asarray(jf(*args))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:40s} {max(min(ts)-_RTT,0)*1000:8.2f} ms", flush=True)

triv = jax.jit(lambda x: jnp.sum(x[0, 0, 0]))
np.asarray(triv(xb))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    np.asarray(triv(xb))
    ts.append(time.perf_counter() - t0)
_RTT = min(ts)
print(f"RTT {_RTT*1000:.2f} ms", flush=True)

def fwd(p, x):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in model.head_outputs(p, x))

timed("int8 backbone+pan+head (shipped)", fwd, qp, xb)

orig_qconcat = blocks._qconcat
orig_qadd = blocks._qadd

def fast_qconcat(parts, axis=-1):
    if all(isinstance(p, blocks.QTensor) for p in parts):
        return blocks.QTensor(
            jnp.concatenate([p.q for p in parts], axis=axis), parts[0].s, parts[0].ref)
    return orig_qconcat(parts, axis=axis)

def fast_qadd(a, b, out_scale=None):
    if isinstance(a, blocks.QTensor) and isinstance(b, blocks.QTensor):
        q = jnp.clip(a.q.astype(jnp.int16) + b.q.astype(jnp.int16), -127, 127)
        return blocks.QTensor(q.astype(jnp.int8), a.s, a.ref)
    return orig_qadd(a, b, out_scale)

import yolort_tpu.models.pan as pan_mod

blocks._qconcat = fast_qconcat
pan_mod._qconcat = fast_qconcat
timed("int8, concat rescale SKIPPED", fwd, qp, xb)
blocks._qadd = fast_qadd
timed("int8, concat+add glue SKIPPED", fwd, qp, xb)
blocks._qconcat = orig_qconcat
pan_mod._qconcat = orig_qconcat
timed("int8, only add glue SKIPPED", fwd, qp, xb)
blocks._qadd = orig_qadd

# also: bf16 reference
timed("bf16 backbone+pan+head", fwd, params, xb)
