#!/usr/bin/env python
"""End-to-end throughput benchmark: yolov5s @640, batch inference with
in-graph uint8 normalize + letterbox + backbone + PAN + head + decode + NMS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

Baseline: driver target >= 1500 imgs/sec/chip on TPU v5e (BASELINE.md).
Runs on whatever backend the environment provides (axon TPU in this image).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--pre-nms-topk", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.utils import cast_floating

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_yolo(args.arch, score_thresh=0.25, pre_nms_topk=args.pre_nms_topk)
    params = model.init(jax.random.PRNGKey(0))
    params = cast_floating(params, dtype)

    s = args.size
    plan = LetterboxPlan((s, s), (s, s), (s, s), (0, 0))

    @jax.jit
    def pipeline(params, raw_u8):
        # uint8 HWC frames -> normalized -> letterbox -> model -> NMS
        imgs = raw_u8.astype(dtype) * (1.0 / 255.0)
        canvas = letterbox_batch(imgs, plan)
        det = model(params, canvas)
        return det.boxes, det.scores, det.labels, det.num

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (args.batch, s, s, 3), dtype=np.uint8))

    for _ in range(args.warmup):
        jax.block_until_ready(pipeline(params, raw))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pipeline(params, raw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch * args.iters / dt
    result = {
        "metric": f"imgs/sec/chip {args.arch}@{s} batch{args.batch} e2e(letterbox+NMS) {args.dtype}",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / 1500.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
