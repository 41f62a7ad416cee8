#!/usr/bin/env python
"""Train-step cumulative stage budget on TPU (VERDICT r4 item 4).

``train_imgs_per_sec`` (642 @ b64, BENCH_r04) is ~16% MFU-equivalent and was
never decomposed.  This times cumulative prefixes of the step with the
chained-iteration method (each iteration data-depends on the previous via an
image jitter or the threaded TrainState; one scalar fetch; trivial-fetch RTT
subtracted):

  fwd         head_outputs forward only
  +loss       forward + YOLOLoss (fixed-shape build_targets + BCE/IoU)
  dx-only     grad wrt images (dW matmuls DCE'd) — the transposed-conv chain
  conv-bwd    grad of sum(outs) wrt params (full conv backward, no loss bwd)
  +grad       value_and_grad of the real loss
  +opt        the full shipping train step, py-loop and lax.scan-chained

Differences between consecutive rows are the per-stage costs.  Two traps
this harness hit and now documents: (1) consuming only ONE grad leaf lets
XLA DCE the other layers' dW matmuls — the +grad row must consume every
leaf; (2) the py-loop-vs-scan A/B shows per-step dispatch costs ~2 ms, so
the step time is real compute, not relay overhead.

Measured (v5e, bf16 @640, docs/PERF.md "Training step budget"): the
backward is the step — dx 34.5 + dW 30.2 ms at b64 vs fwd 15.9 — and it is
bandwidth-starved at b64 exactly like the forward (fwd b64 runs at 58% of
the b128 per-image rate).  Batch 128 fits HBM and lifts the full step
648 -> 864 imgs/s (+33%); it is the shipping bench default.
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
        # consume EVERY grad leaf: consuming only one lets XLA dead-code
        # -eliminate the other layers' dW matmuls (the dx chain survives
        # either way, but dW is ~half the backward FLOPs), which understates
        # the backward cost by tens of ms at b64.
        def body(i, acc):
            (total, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
                params, jit_img(images, acc), targets, mask)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return acc + total.astype(jnp.float32) + gsum
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    def grad_convs_only(params, images):
        # grad of sum(head outputs): the conv-stack backward (dx chain + all
        # dW) with NO loss backward — isolates conv backward from the loss's
        # gather-backward (scatter-add) and dense-grid BCE backward.
        def trivial_loss(p, imgs):
            outs = model.head_outputs(p, imgs)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        def body(i, acc):
            val, grads = jax.value_and_grad(trivial_loss)(params, jit_img(images, acc))
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return acc + val + gsum
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    def grad_dx_only(params, images):
        # grad wrt IMAGES only: XLA keeps the dx transposed-conv chain but
        # dead-code-eliminates every dW matmul — splits the conv backward
        # into its dx and dW halves.
        def trivial_loss(imgs, p):
            outs = model.head_outputs(p, imgs)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        def body(i, acc):
            val, gimg = jax.value_and_grad(trivial_loss)(jit_img(images, acc), params)
            return acc + val + jnp.sum(gimg.astype(jnp.float32))
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    timed("fwd (head_outputs)", fwd_only)
    timed("+ loss (build_targets+BCE+IoU)", fwd_loss)
    timed("grad wrt images (dx chain only)", grad_dx_only)
    timed("grad of sum(outs) (conv bwd only)", grad_convs_only)
    timed("+ grad (backward)", fwd_grad)

    # full step: thread the TrainState (the shipping bench method) —
    # Python loop, one dispatch per step.  Through the relay each dispatch
    # pays host round-trip overhead that a directly-attached chip (or an
    # in-graph chain) would not.
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
    print(f"{'+ opt (py-loop dispatch/step)':34s} {ms:9.2f} ms/step  "
          f"({b/ms*1000:7.1f} imgs/s)", flush=True)

    # full step, in-graph chained: lax.scan over the SAME train step with
    # the TrainState threaded inside one jitted program — zero per-step
    # dispatch, the method every other bench row uses.  The gap between
    # this row and the py-loop row is pure dispatch overhead, not compute.
    def scanned(state, images):
        def body(st, _):
            st2, metrics = task.train_step(st, images, targets, mask)
            return st2, metrics["bbox_regression"]

        st, ys = jax.lax.scan(body, state, None, length=args.iters)
        return ys[-1]

    jf = jax.jit(scanned)
    t0 = time.perf_counter()
    float(jf(state, images))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        float(jf(state, images))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - rtt, 1e-9) / args.iters * 1000
    print(f"{'+ opt (in-graph scan chain)':34s} {ms:9.2f} ms/step  "
          f"({b/ms*1000:7.1f} imgs/s)  (compile {compile_s:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
