#!/usr/bin/env python
"""TPU A/B: pre-concat stage-1 on the cell path (s1_impl='precat').

Shipping form: the cell path concatenates the per-level head outputs into
the (B, n_cells, A*kw) cells table, then runs the 2A masked stage-1
reductions over the CONCAT OUTPUT — a third full-table HBM stream
(read heads + write cells + read cells).  Candidate: run the identical
per-row reductions per level BEFORE the concat, so XLA can fuse them into
the concat's read of the head outputs (and, e2e, into the head-conv
epilogues), and pass the (B, Na) result into the path.  Bit-identical by
construction (concat is a pure copy; the reduction is per-row either way)
— asserted on-device before timing.

Timing: bench.py's chained-iteration method (fori_loop-chained e2e model
invocations, one scalar fetch, trivial-fetch RTT subtracted) on both the
serving (score 0.25, topk 512) and exact-eval (0.005, 4096) configs.
"""
import os
import sys
import time
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


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=3)
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

    configs = [
        ("serving 0.25/512", base),
        ("eval 0.005/4096", base.with_thresholds(
            score_thresh=0.005, pre_nms_topk=4096)),
    ]
    for label, model in configs:
        # one-batch on-device bit-parity between the two stage-1 programs
        os.environ["YOLORT_S1_PRECAT"] = "0"
        det_a = jax.jit(model)(params, letterbox_batch(
            raw.astype(dtype) * (1.0 / 255.0), plan))
        os.environ["YOLORT_S1_PRECAT"] = "1"
        det_b = jax.jit(model)(params, letterbox_batch(
            raw.astype(dtype) * (1.0 / 255.0), plan))
        for fa, fb, n in zip(det_a, det_b, ("boxes", "scores", "labels", "num")):
            same = bool(jnp.all(fa == fb))
            if not same:
                print(f"{label}: PARITY MISMATCH on {n}")
                return 1
        print(f"{label}: bit-identical across s1 variants", flush=True)

        for hook, tag in (("0", "stage-1 on concat output (shipping)"),
                          ("1", "stage-1 pre-concat (precat)")):
            os.environ["YOLORT_S1_PRECAT"] = hook
            ips = run_config(model, params, raw, dtype, plan,
                             args.iters, args.repeat)
            print(f"{label:18s} {tag:38s} {ips:8.1f} imgs/s "
                  f"({args.batch / ips * 1000:.2f} ms)", flush=True)
    os.environ.pop("YOLORT_S1_PRECAT", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
