#!/usr/bin/env python
"""P6@1280 int8 batch sweep (round 5).

The bench's `p6_int8` row runs batch 64 for comparability with the r4
inversion-resolution claim, but bf16 measured +35% going b64 -> b128
(PERF.md win 0: batch starvation at 1280) and the int8 step was never
measured above 64.  int8 activations are *smaller* than bf16, so if bf16
fits at b128 the int8 config fits too — this harness A/Bs the full
serving e2e (uint8 letterbox + model + NMS, chained timing, same method
as bench.py) at batch {64, 128} for int8 and anchors the same session
with the bf16 b128 row.

Reference context: the reference's published perf table is a P6 variant
(yolov5n6, notebooks/onnx-graphsurgeon-inference-tensorrt.ipynb).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s6_r60")
    ap.add_argument("--size", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--candidates", type=int, default=120)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolort_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import calibrate_candidate_density, run_config
    from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.ops.quantization import (
        calibrate_activations,
        finalize_scales,
        quantize_compute_params,
    )
    from yolort_tpu.utils import cast_floating

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    s = args.size
    model = build_yolo(args.arch, score_thresh=0.25, pre_nms_topk=512)
    plan = LetterboxPlan((s, s), (s, s), (s, s), (0, 0))

    def make_qparams(params, raw):
        # bench.py's make_qparams recipe (calibrate -> quantize -> static +
        # concat-group-unified scales), replicated: it is a closure there
        lb = jax.jit(lambda r: letterbox_batch(r, plan))
        idxs = [i for i in (0, 2, 4, 6) if i + 2 <= raw.shape[0]] or [0]
        cal = [lb(raw[i: i + 2].astype(dtype) * (1.0 / 255.0)) for i in idxs]
        pc = calibrate_activations(model.head_outputs, params, cal)
        qp = finalize_scales(
            model.head_outputs, quantize_compute_params(pc),
            np.asarray(cal[0][:1], np.float32),
        )
        return jax.device_put(qp)

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        raw = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
        params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
        params, _, dens = calibrate_candidate_density(
            model, params, raw, dtype, plan, target=args.candidates)
        for tag, p in (("bf16", params), ("int8", make_qparams(params, raw))):
            r = run_config(model, p, raw, dtype, plan, args.iters, args.repeat)
            rows.append((tag, b, r))
            print(f"{tag} b{b}: {r:.1f} imgs/s  (dens {dens:.0f})", flush=True)

    print("\n| config | imgs/s |")
    print("|---|---|")
    for tag, b, r in rows:
        print(f"| {tag} b{b} | {r:.1f} |")


if __name__ == "__main__":
    main()
