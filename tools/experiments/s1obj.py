#!/usr/bin/env python
"""TPU A/B: stage-1 obj-lane extraction — masked full-lane max vs lane slice.

The cell path's stage-1 screen (`ops/nms._stage1_per_anchor`) runs 2A=6
masked full-lane max-reductions over the (n_cells, A*kw) table: per anchor,
one for the class segment and one to extract the SINGLE obj lane.  The
masks are trace-time constants (the iota compares fold), so each pass costs
a select + a max over all 255 lanes — 12 VPU ops/element total.  The obj
passes reduce 255 lanes to pick one known lane: a static lane slice
`rows[:, base+4]` reads it directly, halving the reduction passes
(6 ops/elem + 3 single-lane slices).  Bit-identical by construction (the
masked max with a -1e4 filler returns exactly the lane value: head logits
are bounded well above -1e4).

If this measures neutral, the 3.77 ms concat+stage-1 serving budget row
(PERF.md round-5 serving notes) is bandwidth-bound, not VPU-bound, and the
remaining gap to its ~1.4 ms copy floor is the concat write + reduction
read streams themselves.

Timing: bench.py's chained-iteration method, serving (0.25/512) and exact
eval (0.005/4096) configs, on-device bit-parity gate first.
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
from yolort_tpu.ops import nms as nms_mod
from yolort_tpu.utils import cast_floating


def _stage1_obj_slice(rows: jax.Array, A: int, kw: int) -> jax.Array:
    """Variant: class segment by masked max (as shipped), obj lane by a
    static lane slice instead of a 255-lane masked max."""
    clane = jnp.arange(A * kw, dtype=jnp.int32)
    neg = jnp.asarray(-1.0e4, rows.dtype)
    per = []
    for a in range(A):
        base = a * kw
        obj_l = rows[..., base + 4]
        cls_l = jnp.max(
            jnp.where((clane >= base + 5) & (clane < base + kw), rows, neg),
            axis=-1)
        per.append(jax.nn.sigmoid(cls_l) * jax.nn.sigmoid(obj_l))
    return jnp.stack(per, axis=-1)


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

    shipped = nms_mod._stage1_per_anchor
    variants = [("masked-max obj (shipped)", shipped),
                ("lane-slice obj", _stage1_obj_slice)]

    configs = [
        ("serving 0.25/512", base),
        ("eval 0.005/4096", base.with_thresholds(
            score_thresh=0.005, pre_nms_topk=4096)),
    ]
    try:
        for label, model in configs:
            dets = []
            for _, fn in variants:
                nms_mod._stage1_per_anchor = fn
                dets.append(jax.jit(model)(params, letterbox_batch(
                    raw.astype(dtype) * (1.0 / 255.0), plan)))
            for fa, fb, n in zip(dets[0], dets[1],
                                 ("boxes", "scores", "labels", "num")):
                if not bool(jnp.all(fa == fb)):
                    print(f"{label}: PARITY MISMATCH on {n}")
                    return 1
            print(f"{label}: bit-identical across obj-extraction variants",
                  flush=True)

            for tag, fn in variants:
                nms_mod._stage1_per_anchor = fn
                ips = run_config(model, params, raw, dtype, plan,
                                 args.iters, args.repeat)
                print(f"{label:18s} {tag:28s} {ips:8.1f} imgs/s "
                      f"({args.batch / ips * 1000:.2f} ms)", flush=True)
    finally:
        nms_mod._stage1_per_anchor = shipped
    return 0


if __name__ == "__main__":
    sys.exit(main())
