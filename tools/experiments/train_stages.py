#!/usr/bin/env python
"""Train-step cumulative stage budget on TPU (VERDICT r4 item 4).

``train_imgs_per_sec`` (642 @ b64, BENCH_r04) is ~16% MFU-equivalent and was
never decomposed.  This times cumulative prefixes of the step with the
chained-iteration method (each iteration data-depends on the previous via an
image jitter or the threaded TrainState; one scalar fetch; trivial-fetch RTT
subtracted):

  fwd         head_outputs forward only
  +loss       forward + YOLOLoss (fixed-shape build_targets + BCE/IoU)
  +grad       value_and_grad of the same (backward pass)
  +opt        the full shipping train step (fwd+loss+bwd+optimizer)

Differences between consecutive rows are the per-stage costs.  A floor
argument for context: the b128 serving forward is HBM-floor-bound at
18.65 ms (docs/PERF.md); a backward pass moves ~2x the forward's traffic,
so a not-crazy step floor at b64 is ~0.5*18.65*(1+2.2) ~ 30 ms = ~2100
imgs/s — the measured 99.7 ms says ~70 ms is NOT conv traffic and must be
located before it can be attacked.
"""
import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from yolort_tpu.models.losses import pad_targets
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.trainer import DefaultTask, make_train_step
    from yolort_tpu.trainer.task import TrainState
    from yolort_tpu.utils import cast_floating

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, s = args.batch, args.size
    model = build_yolo(args.arch)
    task = DefaultTask(model, lr=0.01)
    state = task.init_state(jax.random.PRNGKey(0))
    params = cast_floating(state.params, dtype)
    state = TrainState(params, task.tx.init(params), state.step)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32), dtype)
    per_img = [
        {
            "labels": rng.integers(0, model.num_classes, (12,)),
            "boxes_cxcywh_norm": np.clip(rng.uniform(0.05, 0.95, (12, 4)), 0.05, 0.4),
        }
        for _ in range(b)
    ]
    targets, mask = pad_targets(per_img, 16)

    trivial = jax.jit(lambda x: jnp.sum(x[0, 0, 0]))
    float(trivial(images))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(images))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"backend={jax.default_backend()} b={b} size={s} {args.dtype}  "
          f"RTT {rtt*1000:.1f} ms", flush=True)

    def timed(label, chained_fn):
        f = jax.jit(chained_fn)
        t0 = time.perf_counter()
        float(f(params, images))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            float(f(params, images))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - rtt, 1e-9) / args.iters * 1000
        print(f"{label:34s} {ms:9.2f} ms/step  ({b/ms*1000:7.1f} imgs/s)"
              f"  (compile {compile_s:.0f}s)", flush=True)
        return ms

    def jit_img(imgs, acc):
        return imgs + (acc % 3).astype(dtype) * 1e-6

    def fwd_only(params, images):
        def body(i, acc):
            outs = model.head_outputs(params, jit_img(images, acc))
            return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    def fwd_loss(params, images):
        def body(i, acc):
            total, _ = task.loss_fn(params, jit_img(images, acc), targets, mask)
            return acc + total.astype(jnp.float32)
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    def fwd_grad(params, images):
        def body(i, acc):
            (total, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
                params, jit_img(images, acc), targets, mask)
            leaf = jax.tree_util.tree_leaves(grads)[0]
            return acc + total.astype(jnp.float32) + jnp.sum(leaf.astype(jnp.float32))
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    timed("fwd (head_outputs)", fwd_only)
    timed("+ loss (build_targets+BCE+IoU)", fwd_loss)
    timed("+ grad (backward)", fwd_grad)

    # full step: thread the TrainState (the shipping bench method)
    step = make_train_step(task)
    for _ in range(2):
        state, metrics = step(state, images, targets, mask)
    float(metrics["bbox_regression"])
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        st = state
        for _ in range(args.iters):
            st, metrics = step(st, images, targets, mask)
        float(metrics["bbox_regression"])
        best = min(best, time.perf_counter() - t0)
    ms = max(best - rtt, 1e-9) / args.iters * 1000
    print(f"{'+ opt (full shipping step)':34s} {ms:9.2f} ms/step  "
          f"({b/ms*1000:7.1f} imgs/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
