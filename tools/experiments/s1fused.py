#!/usr/bin/env python
"""TPU A/B: fused Pallas cells-concat + stage-1 vs the XLA formulations.

The serving floor notes (docs/PERF.md) leave exactly one postprocess stage
above its pure-traffic floor: "cells concat + segmented stage-1" measures
2.5-4.1 ms vs 1.35 ms for one read+write pass of the cell table, and every
in-XLA reshuffle is measured neutral-or-worse (negatives -2b, -5 — "beating
it needs a different formulation").  ops/pallas/s1_kernel.py IS a different
formulation: one Pallas pass writes each level block into its cells slice
while the 2A masked max-reductions run on the VMEM-resident block — no
second HBM stream for the reduction.  CPU interpret-mode parity is pinned
in tests/test_s1_fused.py; this harness gates on-device bit-parity, then
times the full serving / eval e2e with bench.py's chained method across
s1_impl in {cells (in-path default), precat, fused}.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("YOLORT_JAX_CACHE", "/tmp/yolort_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from bench import calibrate_candidate_density, run_config
from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.utils import cast_floating

VARIANTS = [
    ({}, "s1_impl=cells (in-path default)"),
    ({"YOLORT_S1_PRECAT": "1"}, "s1_impl=precat"),
    ({"YOLORT_S1_FUSED": "1"}, "s1_impl=fused (Pallas one-pass)"),
]


def _set(env):
    for k in ("YOLORT_S1_PRECAT", "YOLORT_S1_FUSED"):
        os.environ.pop(k, None)
    os.environ.update(env)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    s = args.size
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (args.batch, s, s, 3), dtype=np.uint8))
    plan = LetterboxPlan((s, s), (s, s), (s, s), (0, 0))

    base = build_yolo(args.arch, pre_nms_topk=512, nms_tile_size=128)
    params = cast_floating(base.init(jax.random.PRNGKey(0)), dtype)
    params, delta, dens = calibrate_candidate_density(
        base, params, raw, dtype, plan)
    print(f"calibrated: shift={delta:.3f} cand/img@0.25={dens:.0f}", flush=True)

    configs = [("serving 0.25/512", base)]
    if not args.skip_eval:
        configs.append(("eval 0.005/4096", base.with_thresholds(
            score_thresh=0.005, pre_nms_topk=4096)))

    for label, model in configs:
        # one-batch on-device bit-parity across all three variants
        dets = []
        for env, _tag in VARIANTS:
            _set(env)
            dets.append(jax.jit(model)(params, letterbox_batch(
                raw.astype(dtype) * (1.0 / 255.0), plan)))
        for det_b, (_, tag) in zip(dets[1:], VARIANTS[1:]):
            for fa, fb, n in zip(dets[0], det_b,
                                 ("boxes", "scores", "labels", "num")):
                if not bool(jnp.all(fa == fb)):
                    print(f"{label}: PARITY MISMATCH on {n} for {tag}")
                    return 1
        print(f"{label}: bit-identical across s1_impl variants", flush=True)

        for env, tag in VARIANTS:
            _set(env)
            ips = run_config(model, params, raw, dtype, plan,
                             args.iters, args.repeat)
            print(f"{label:18s} {tag:38s} {ips:8.1f} imgs/s "
                  f"({args.batch / ips * 1000:.2f} ms)", flush=True)
    _set({})
    return 0


if __name__ == "__main__":
    sys.exit(main())
