#!/usr/bin/env python
"""TPU A/B: stage-1 select implementation on the cell path (s1_select).

Shipping form (round 4): `select_topk_indices` — ONE whole-domain
single-operand i32 sort of `tier<<B | index` keys.  It won its A/B at the
EVAL config (k1=4104), where the alternative compaction's k1-row chunk
gather costs ~6 ms at batch 128.  But the gather is latency-bound in ROW
COUNT while the sort always pays the full 25k-domain price, so the
decision cannot transfer to the SERVING config (k1=520, ~8x fewer rows) —
exactly the eval-config-only falsification gap VERDICT r4 flagged.
Candidate: `select_topk_indices_compact` (bisect + stream compaction,
sort=False), bit-identical set and tie order by construction.

Timing: bench.py's chained-iteration method on the serving (0.25/512) and
exact-eval (0.005/4096) configs, with an on-device bit-parity gate first.
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
        # one-batch on-device bit-parity between the two stage-1 selects
        os.environ["YOLORT_S1_COMPACT"] = "0"
        det_a = jax.jit(model)(params, letterbox_batch(
            raw.astype(dtype) * (1.0 / 255.0), plan))
        os.environ["YOLORT_S1_COMPACT"] = "1"
        det_b = jax.jit(model)(params, letterbox_batch(
            raw.astype(dtype) * (1.0 / 255.0), plan))
        for fa, fb, n in zip(det_a, det_b, ("boxes", "scores", "labels", "num")):
            if not bool(jnp.all(fa == fb)):
                print(f"{label}: PARITY MISMATCH on {n}")
                return 1
        print(f"{label}: bit-identical across s1_select variants", flush=True)

        for hook, tag in (("0", "s1_select=sortidx (whole-domain sort)"),
                          ("1", "s1_select=compact (stream compaction)")):
            os.environ["YOLORT_S1_COMPACT"] = hook
            ips = run_config(model, params, raw, dtype, plan,
                             args.iters, args.repeat)
            print(f"{label:18s} {tag:40s} {ips:8.1f} imgs/s "
                  f"({args.batch / ips * 1000:.2f} ms)", flush=True)
    os.environ.pop("YOLORT_S1_COMPACT", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
