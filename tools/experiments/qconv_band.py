#!/usr/bin/env python
"""TPU e2e A/B: shape-gated fused int8 conv (YOLORT_QCONV=band) vs the
all-XLA int8 path, at the configs where the per-shape sweep says the
kernel wins.

Round-5 follow-up to tools/experiments/qconv_shapes.py: the per-shape
P6@1280 table shows the fused kernel winning ONLY at large-extent
narrow-channel 1x1s (160x160x{64,128}->{64..255}, 320x320x64->64 —
~1.8 ms summed over sites), while every 3x3 and wide-channel shape loses
(the r3 falsification).  ``qconv.shape_gated`` wires exactly that band
behind YOLORT_QCONV=band.  This harness checks whether the isolated
per-conv wins TRANSFER e2e (r3's lesson: they often don't — XLA fuses
neighbors into the convs it owns), by tracing the same int8-static model
twice in one process with the env flipped between traces:

  * head_outputs (backbone+PAN+head) chained, off vs band;
  * e2e serving (letterbox+NMS), off vs band;
  * detection parity between the two programs (same inputs).

Run: python tools/experiments/qconv_band.py --p6   (P6@1280 b64 + @640 b128)
"""
import argparse
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("YOLORT_JAX_CACHE", "/tmp/yolort_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent.parent))

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
ap.add_argument("--p6", action="store_true")
ap.add_argument("--p6-arch", default="yolov5_darknet_pan_s6_r60")
ap.add_argument("--p6-batch", type=int, default=64)
ap.add_argument("--p6-size", type=int, default=1280)
args = ap.parse_args()

dtype = jnp.bfloat16
rng = np.random.default_rng(0)

x0 = jnp.zeros((8, 8), jnp.float32)
triv = jax.jit(lambda x: jnp.sum(x))
float(triv(x0))
ts = []
for _ in range(6):
    t0 = time.perf_counter(); float(triv(x0)); ts.append(time.perf_counter() - t0)
_RTT = min(ts)
print(f"RTT {_RTT*1000:.2f} ms", flush=True)


def build(arch, size, batch):
    model = build_yolo(arch, score_thresh=0.25, pre_nms_topk=512)
    params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
    plan = LetterboxPlan((size, size), (size, size), (size, size), (0, 0))
    raw = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))
    lb = jax.jit(lambda r: letterbox_batch(r.astype(dtype) * (1.0 / 255.0), plan))
    cal_batches = [np.asarray(lb(raw[i:i + 1]), np.float32) for i in (0, 1)]
    pc = calibrate_activations(model.head_outputs, params, cal_batches)
    div = 64 if "6" in arch.split("_")[-2] else 32
    tiny = cal_batches[0][:1, :div * 2, :div * 2]
    q_st = jax.device_put(finalize_scales(
        model.head_outputs, quantize_compute_params(pc), tiny))
    return model, q_st, plan, raw, lb


def timed_backbone(label, model, params, imgs, iters):
    def chained(params, imgs):
        def body(i, acc):
            outs = model.head_outputs(
                params, imgs + (acc % 3).astype(imgs.dtype) * 1e-6)
            return acc + jnp.sum(outs[0][..., 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    jf = jax.jit(chained)
    t0 = time.perf_counter(); float(jf(params, imgs)); comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(jf(params, imgs))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - _RTT, 0) / iters * 1000.0
    print(f"{label:44s} {ms:8.2f} ms/step (compile {comp:.0f}s)", flush=True)
    return ms


def timed_e2e(label, model, params, raw, plan, iters):
    def chained(params, raw_u8):
        def body(i, acc):
            imgs = raw_u8.astype(dtype) * (1.0 / 255.0) + (acc % 3).astype(dtype) * 1e-6
            det = model(params, letterbox_batch(imgs, plan))
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


def ab(arch, size, batch, iters):
    print(f"== {arch} @{size} batch {batch} (int8 static scales) ==", flush=True)
    model, q_st, plan, raw, lb = build(arch, size, batch)
    imgs = lb(raw)
    out = {}
    for mode in ("0", "band"):
        os.environ["YOLORT_QCONV"] = mode
        tag = "xla" if mode == "0" else "band"
        out[f"bb_{tag}"] = timed_backbone(
            f"  backbone int8-static [{tag}]", model, q_st, imgs, iters)
        out[f"e2e_{tag}"] = timed_e2e(
            f"  serving e2e int8-static [{tag}]", model, q_st, raw, plan, iters)
    # parity: same detections from both programs on one batch
    os.environ["YOLORT_QCONV"] = "0"
    d0 = jax.jit(lambda p, x: model(p, x))(q_st, imgs)
    os.environ["YOLORT_QCONV"] = "band"
    d1 = jax.jit(lambda p, x: model(p, x))(q_st, imgs)
    os.environ["YOLORT_QCONV"] = "0"
    n0, n1 = np.asarray(d0.num), np.asarray(d1.num)
    print(f"  parity: num match {(n0 == n1).mean()*100:.1f}%  "
          f"max|score delta| "
          f"{np.abs(np.asarray(d0.scores, np.float32) - np.asarray(d1.scores, np.float32)).max():.4f}",
          flush=True)
    dlt = out["bb_xla"] - out["bb_band"]
    print(f"  backbone delta {dlt:+.2f} ms  e2e delta "
          f"{out['e2e_band'] - out['e2e_xla']:+.1f} imgs/s", flush=True)
    return out


ab(args.arch, args.size, args.batch, args.iters)
if args.p6:
    ab(args.p6_arch, args.p6_size, args.p6_batch, max(args.iters // 2, 8))
