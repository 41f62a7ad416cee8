#!/usr/bin/env python
"""Per-shape TPU A/B: Pallas fused-epilogue int8 conv vs the XLA int8 path,
at the shapes the round-3 falsification did NOT cover.

The r3 qconv negative result (docs/PERF.md negative 0) measured the kernels
losing 1.5-6x per conv at the @640 shapes.  VERDICT r4 item 2: the s32
traffic argument is *strongest at P6@1280 and the late high-channel
layers*, where the kernel's fixed per-grid-step overheads amortize over 4x
the rows — exactly where qconv was never shown to lose.  This harness
walks the REAL conv shape set of a quantized model forward (collected by
tracing head_outputs under eval_shape with a recording conv wrapper), then
chained-times each distinct stride-1 groups-1 k in {1,3} shape:

  * XLA: s8 x s8 -> s32 conv custom-call + fused dequant/bias/SiLU/requant
    (the shipping ``_conv_int8`` + ``_requantize`` math);
  * Pallas: ``ops/pallas/qconv.qconv`` with the epilogue in-kernel and the
    int8 activation written directly (s32 never leaves VMEM).

Run: python tools/experiments/qconv_shapes.py --arch yolov5_darknet_pan_s6_r60
     --size 1280 --batch 64
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


def collect_conv_shapes(arch: str, size: int):
    """Distinct (k, h, w, cin, cout) of every stride-1 groups-1 k in {1,3}
    conv in the quantized model's forward at the given input size, via a
    recording wrapper around the conv primitive under eval_shape (no
    compute, no device)."""
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.ops import blocks
    from yolort_tpu.ops.quantization import (
        calibrate_activations,
        quantize_compute_params,
    )
    from yolort_tpu.utils import cast_floating

    model = build_yolo(arch)
    # bf16 floating leaves: the unquantized glue runs in the bench dtype,
    # matching the bf16 probe input
    params = cast_floating(model.init(jax.random.PRNGKey(0)), jnp.bfloat16)
    # quantize_compute_params only converts leaves that carry calibration
    # markers — record them with one tiny eager batch (the *shapes* are
    # collected below at the full --size via eval_shape; the calibration
    # size only has to hit every conv once, and eager-through-the-relay
    # cost scales with it)
    cal_size = 320 if size % 64 == 0 else 256
    cal = jnp.asarray(
        np.random.default_rng(0).random((1, cal_size, cal_size, 3)),
        jnp.bfloat16)
    pc = calibrate_activations(model.head_outputs, params, [cal])
    qparams = quantize_compute_params(pc)

    seen = {}
    real = blocks.conv2d_nhwc

    def recording(x, w, *, stride=1, padding=0, groups=1, **kw):
        if (w.dtype == jnp.int8 and stride == 1 and groups == 1
                and w.shape[0] == w.shape[1] and w.shape[0] in (1, 3)):
            key = (w.shape[0], x.shape[1], x.shape[2], x.shape[3], w.shape[3])
            seen[key] = seen.get(key, 0) + 1
        return real(x, w, stride=stride, padding=padding, groups=groups, **kw)

    blocks.conv2d_nhwc = recording
    try:
        jax.eval_shape(
            lambda p, x: model.head_outputs(p, x),
            qparams, jax.ShapeDtypeStruct((1, size, size, 3), jnp.bfloat16),
        )
    finally:
        blocks.conv2d_nhwc = real
    return seen


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s6_r60")
    ap.add_argument("--size", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--min-mb", type=float, default=0.0,
                    help="skip shapes whose int8 output is below this many "
                         "MB at the bench batch (drop the tiny tail)")
    args = ap.parse_args()

    from yolort_tpu.ops import blocks
    from yolort_tpu.ops.pallas import qconv as qk

    shapes = collect_conv_shapes(args.arch, args.size)
    print(f"{args.arch}@{args.size}: {len(shapes)} distinct 1x1/3x3 s1 "
          f"shapes ({sum(shapes.values())} conv sites)", flush=True)

    rng = np.random.default_rng(0)
    trivial = jax.jit(lambda x: jnp.sum(x[0]))

    def timed(fn, *arrs, iters, repeat):
        f = jax.jit(fn)
        int(f(*arrs))
        z = jnp.zeros((8,), jnp.int32)
        int(trivial(z))
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(trivial(z))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            int(f(*arrs))
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 1e-9) / iters

    results = []
    for (k, h, w, cin, cout), count in sorted(shapes.items()):
        out_mb = args.batch * h * w * cout / 1e6
        if out_mb < args.min_mb:
            continue
        xq = jnp.asarray(rng.integers(-100, 100, (args.batch, h, w, cin)),
                         jnp.int8)
        wq = jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)), jnp.int8)
        scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (cout,)), jnp.float32)
        bias = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        inv_os = jnp.float32(37.5)

        def xla_path(xq, wq, jit_i):
            x = (xq + jit_i.astype(jnp.int8)).astype(jnp.int8)
            y = blocks.conv2d_nhwc(
                x, wq, stride=1, padding=k // 2,
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
            yf = yf * jax.nn.sigmoid(yf)
            q = jnp.clip(jnp.round(yf * inv_os), -127.0, 127.0).astype(jnp.int8)
            return q

        def pallas_path(xq, wq, jit_i):
            x = (xq + jit_i.astype(jnp.int8)).astype(jnp.int8)
            q = qk.qconv(x, wq, scale, bias, k=k, act="silu",
                         inv_out_scale=inv_os)
            return q

        def chained(path):
            def fn(xq, wq):
                def body(i, acc):
                    q = path(xq, wq, acc % 2)
                    return acc + jnp.sum(q[:, 0, 0, :].astype(jnp.int32))
                return jax.lax.fori_loop(0, args.iters, body, jnp.int32(0))
            return fn

        # supported at all? (3x3 VMEM estimate falls back above ~12 MB)
        probe = qk.qconv(xq[:1], wq, scale, bias, k=k, act="silu",
                         inv_out_scale=inv_os)
        tag = f"{k}x{k} {h}x{w}x{cin}->{cout} (x{count})"
        t_xla = timed(chained(xla_path), xq, wq,
                      iters=args.iters, repeat=args.repeat) * 1000
        if probe is None:
            print(f"{tag:36s} xla {t_xla:7.3f} ms   pallas: unsupported "
                  f"(3x3 VMEM estimate > 12 MB)", flush=True)
            results.append((tag, count, t_xla, None))
            continue
        t_pal = timed(chained(pallas_path), xq, wq,
                      iters=args.iters, repeat=args.repeat) * 1000
        verdict = "KERNEL WINS" if t_pal < t_xla else "xla wins"
        print(f"{tag:36s} xla {t_xla:7.3f} ms   pallas {t_pal:7.3f} ms   "
              f"{verdict}", flush=True)
        results.append((tag, count, t_xla, t_pal))

    tot_xla = sum(r[2] * r[1] for r in results)
    tot_best = sum(min(r[2], r[3] if r[3] is not None else r[2]) * r[1]
                   for r in results)
    print(f"\nsum over sites: xla {tot_xla:.2f} ms, best-of-both "
          f"{tot_best:.2f} ms (upper-bound win {tot_xla - tot_best:.2f} ms)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
