#!/usr/bin/env python
"""Stage-wise profiling of the inference pipeline on the current backend.

Times (a) backbone+PAN+head, (b) +decode, (c) topk, (d) NMS (xla / pallas)
separately to locate the bottleneck.  Each stage returns a scalar that is
fetched to host (block_until_ready does not block through the axon relay);
the trivial-fetch RTT is measured and subtracted.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT = 0.0


def timed(fn, *args, iters=10, warmup=2, label=""):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    best = max(min(ts) - _RTT, 0.0)
    print(f"{label:45s} {best*1000:9.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return best


def main():
    global _RTT
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--topk", type=int, default=4096)
    ap.add_argument("--stages", default="head,decode,topk,nms_xla,nms_pallas,full")
    args = ap.parse_args()

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.ops import nms as nms_ops
    from yolort_tpu.utils import cast_floating

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    stages = args.stages.split(",")

    model = build_yolo(args.arch, pre_nms_topk=args.topk)
    params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.batch, args.size, args.size, 3)),
        dtype,
    )
    print(f"backend={jax.default_backend()} batch={args.batch} size={args.size} dtype={args.dtype}")

    # RTT calibration
    triv = jax.jit(lambda x: jnp.sum(x[0, 0, 0]))
    float(triv(x))
    _RTT = min(
        (lambda: (lambda t0: (float(triv(x)), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(5)
    )
    print(f"fetch RTT: {_RTT*1000:.2f} ms", flush=True)

    if "head" in stages:
        timed(lambda p, x: sum(jnp.sum(o.astype(jnp.float32)) for o in model.head_outputs(p, x)),
              params, x, label="backbone+pan+head")
    if "decode" in stages:
        timed(lambda p, x: jnp.sum(model.decode(p, x)), params, x, label="+decode")
    pred = jax.jit(model.decode)(params, x)
    if "topk" in stages:
        def topk_only(pred):
            scores = pred[..., 5:] * pred[..., 4:5]
            flat = scores.reshape(scores.shape[0], -1)
            v, i = jax.lax.top_k(flat, args.topk)
            return jnp.sum(v) + jnp.sum(i)
        timed(topk_only, pred, label=f"decode-out topk(k={args.topk})")
    for impl in ("xla", "pallas"):
        if f"nms_{impl}" not in stages:
            continue
        if impl == "pallas" and jax.default_backend() == "cpu":
            continue
        def post(pred, impl=impl):
            det = nms_ops.batched_postprocess(
                pred, num_classes=model.num_classes, score_thresh=model.score_thresh,
                nms_thresh=model.nms_thresh, detections_per_img=300,
                pre_nms_topk=args.topk, nms_tile_size=model.nms_tile_size, nms_impl=impl,
            )
            return jnp.sum(det.num)
        try:
            timed(post, pred, label=f"postprocess nms_impl={impl}")
        except Exception as e:
            print(f"postprocess nms_impl={impl} FAILED: {type(e).__name__}: {str(e)[:200]}")
    if "full" in stages:
        dt = timed(lambda p, x: jnp.sum(model(p, x).num), params, x, label="full pipeline")
        if dt > 0:
            print(f"imgs/sec: {args.batch/dt:.1f}")


if __name__ == "__main__":
    main()
