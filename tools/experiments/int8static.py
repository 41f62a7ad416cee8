#!/usr/bin/env python
"""TPU A/B: int8 glue — runtime activation scales vs finalize_scales
(static + concat-group-unified scales).

VERDICT r3 item 3 / PERF.md "Serving ceiling": the int8 backbone ran at
16.3 ms vs its 11.5 ms traffic floor, and the qconv post-mortem attributed
the residue to the int8-domain glue — the runtime-scale requantize passes
at concat/add boundaries that XLA cannot fold.  finalize_scales removes
them from the graph entirely (scales become trace-time constants; every
concat group's producer scales are unified to the group max, making the
rescale ratios exactly 1.0).  This harness measures:

  * head_outputs (backbone+PAN+head) chained: bf16 / int8-runtime /
    int8-static — the direct glue measurement;
  * e2e serving (letterbox+NMS): int8-runtime vs int8-static;
  * with --p6: the P6 @1280 inversion check (int8 was SLOWER than bf16:
    538 vs 662 imgs/s at batch 64 — s32/glue traffic scales with the
    spatial extents).

Run on v5e hardware; results recorded in docs/PERF.md.
"""
import argparse
import time
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.ops.quantization import (
    calibrate_activations,
    finalize_scales,
    quantize_compute_params,
)
from yolort_tpu.utils import cast_floating

ap = argparse.ArgumentParser()
ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--size", type=int, default=640)
ap.add_argument("--iters", type=int, default=20)
ap.add_argument("--p6", action="store_true", help="also run the P6@1280 check")
ap.add_argument("--p6-batch", type=int, default=64)
args = ap.parse_args()

dtype = jnp.bfloat16
rng = np.random.default_rng(0)

_RTT = 0.0
x0 = jnp.zeros((8, 8), jnp.float32)
triv = jax.jit(lambda x: jnp.sum(x))
float(triv(x0))
ts = []
for _ in range(6):
    t0 = time.perf_counter(); float(triv(x0)); ts.append(time.perf_counter() - t0)
_RTT = min(ts)
print(f"RTT {_RTT*1000:.2f} ms", flush=True)


def timed_chain(label, model, params, imgs, iters):
    """Chained head_outputs timing (one scalar fetch)."""
    def chained(params, imgs):
        def body(i, acc):
            outs = model.head_outputs(params, imgs + (acc % 3).astype(imgs.dtype) * 1e-6)
            return acc + jnp.sum(outs[0][..., 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    jf = jax.jit(chained)
    t0 = time.perf_counter(); float(jf(params, imgs)); comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(jf(params, imgs))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - _RTT, 0) / iters * 1000.0
    print(f"{label:44s} {ms:8.2f} ms/step  ({imgs.shape[0]/ (ms/1000.0):7.1f} imgs/s backbone-only, compile {comp:.0f}s)",
          flush=True)
    return ms


def run_serving(label, model, params, raw, plan, iters):
    def one_pass(params, raw_u8, jitter):
        imgs = raw_u8.astype(dtype) * (1.0 / 255.0) + jitter
        canvas = letterbox_batch(imgs, plan)
        return model(params, canvas)

    def chained(params, raw_u8):
        def body(i, acc):
            det = one_pass(params, raw_u8, (acc % 3).astype(dtype) * 1e-6)
            return acc + jnp.sum(det.num)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    jf = jax.jit(chained)
    t0 = time.perf_counter(); int(jf(params, raw)); comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); int(jf(params, raw))
        best = min(best, time.perf_counter() - t0)
    el = max(best - _RTT, 1e-9)
    rate = raw.shape[0] * iters / el
    print(f"{label:44s} {rate:8.1f} imgs/s e2e (compile {comp:.0f}s)", flush=True)
    return rate


def build_all(arch, size, batch):
    model = build_yolo(arch, score_thresh=0.25, pre_nms_topk=512)
    params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
    plan = LetterboxPlan((size, size), (size, size), (size, size), (0, 0))
    raw = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))
    lb = jax.jit(lambda r: letterbox_batch(r, plan))
    cal_batches = [np.asarray(lb(raw[i:i + 1].astype(dtype) * (1.0 / 255.0)), np.float32)
                   for i in (0, 1)]
    pc = calibrate_activations(model.head_outputs, params, cal_batches)
    q_rt = jax.device_put(quantize_compute_params(pc))
    div = 64 if "6" in arch.split("_")[-2] else 32  # p6 archs need 64-divisible
    tiny = cal_batches[0][:1, :div * 2, :div * 2]
    q_st = jax.device_put(finalize_scales(model.head_outputs, quantize_compute_params(pc), tiny))
    return model, params, q_rt, q_st, plan, raw


print(f"== {args.arch} @{args.size} batch {args.batch} ==", flush=True)
model, params, q_rt, q_st, plan, raw = build_all(args.arch, args.size, args.batch)
imgs = jax.jit(lambda r: letterbox_batch(r.astype(dtype) * (1.0 / 255.0), plan))(raw)

timed_chain("head_outputs bf16", model, params, imgs, args.iters)
timed_chain("head_outputs int8 runtime scales", model, q_rt, imgs, args.iters)
timed_chain("head_outputs int8 STATIC scales", model, q_st, imgs, args.iters)

run_serving("serving int8 runtime scales", model, q_rt, raw, plan, args.iters)
run_serving("serving int8 STATIC scales", model, q_st, raw, plan, args.iters)

# parity: static-vs-runtime head outputs on one batch (PTQ envelope; the
# group-max raising costs at most ~1 rounding bit)
o_rt = jax.jit(model.head_outputs)(q_rt, imgs[:2])
o_st = jax.jit(model.head_outputs)(q_st, imgs[:2])
for a, b in zip(o_rt, o_st):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"head-output maxabs(static - runtime) = {d:.4f}", flush=True)

if args.p6:
    print(f"== P6 @1280 batch {args.p6_batch} ==", flush=True)
    m6, p6, q6_rt, q6_st, plan6, raw6 = build_all(
        "yolov5_darknet_pan_s6_r60", 1280, args.p6_batch)
    imgs6 = jax.jit(lambda r: letterbox_batch(r.astype(dtype) * (1.0 / 255.0), plan6))(raw6)
    timed_chain("P6 head_outputs bf16", m6, p6, imgs6, args.iters)
    timed_chain("P6 head_outputs int8 runtime", m6, q6_rt, imgs6, args.iters)
    timed_chain("P6 head_outputs int8 STATIC", m6, q6_st, imgs6, args.iters)
    run_serving("P6 serving bf16", m6, p6, raw6, plan6, args.iters)
    run_serving("P6 serving int8 STATIC", m6, q6_st, raw6, plan6, args.iters)
