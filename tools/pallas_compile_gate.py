#!/usr/bin/env python
"""Mosaic compile gate: force-compile every Pallas kernel variant on the
current backend and report pass/fail per case.

Why this exists (VERDICT r3 weak #7): the CPU-side ``jax.export``
lowering guard (tests/test_lookup_kernel.py:260) stops at Mosaic MLIR
emission — real backend rejections (e.g. the ``arith.trunci i8->i1`` that
killed the first _select_kernel on hardware) only fire in the actual Mosaic
compile on a TPU host.  Run this at round start and after any kernel edit:

    python tools/pallas_compile_gate.py            # compile-only sweep
    python tools/pallas_compile_gate.py --run      # also execute each case

On a non-TPU backend the tool degrades to the jax.export lowering check and
says so (rc 0 — it cannot prove backend acceptance from CPU).

Exit code: 1 if any SHIPPING kernel fails (the production defaults:
nms_mask, row_fetch f32/bf16-wide, bisect_count, select_extract);
experimental/measured-negative kernels (qconv, compact_select) report
failures without failing the gate unless --strict-all.

Reference analogue: the compile-and-run CI gate
/root/reference/.github/workflows/ci-test.yml:120-147.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


def build_cases():
    """(name, shipping, fn, args) for every kernel family x dtype x the
    production shape grid (eval k=4096 cell path @640, serving k=512)."""
    import jax.numpy as jnp
    import numpy as np

    from yolort_tpu.ops.pallas.compact_kernel import compact_select
    from yolort_tpu.ops.pallas.lookup_kernel import (
        pallas_bisect_count,
        pallas_lookup_fetch,
        pallas_row_fetch,
        pallas_select_extract,
    )
    from yolort_tpu.ops.pallas.nms_kernel import pallas_nms_mask
    from yolort_tpu.ops.pallas.qconv import qconv1x1, qconv3x3
    from yolort_tpu.ops.pallas.s1_kernel import fused_cells_stage1

    rng = np.random.default_rng(0)

    # chunk/meta shapes of the eval cell path @640 (8400 cells, k=4096)
    tab = jnp.asarray(rng.standard_normal((2565, 128)).astype(np.float32))
    phys = jnp.asarray(rng.integers(0, 2565, (4096,), dtype=np.int32))
    p = jnp.asarray(rng.integers(0, 128, (4096,), dtype=np.int32))
    eq = jnp.asarray(rng.integers(0, 2, (4096,), dtype=np.int32)).astype(bool)
    t = jnp.asarray(1_000_000, jnp.int32)
    # the 255-lane bf16 cells table (k1=4104 rows fetched)
    cells = jnp.asarray(
        rng.standard_normal((8400, 255)).astype(np.float32)
    ).astype(jnp.bfloat16)
    pc = jnp.asarray(rng.integers(0, 8400, (4104,), dtype=np.int32))
    # serving-size chunk table (k=512 select @ score 0.25)
    tab_s = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    phys_s = jnp.asarray(rng.integers(0, 512, (512,), dtype=np.int32))
    # monotone exclusive tier offsets for the fused lookup+fetch kernel
    _cnt2 = rng.integers(0, 3, (2 * 2565,), dtype=np.int32)
    off2 = jnp.asarray(np.cumsum(_cnt2) - _cnt2, dtype=jnp.int32)

    # NMS kernel inputs: score-sorted class-offset boxes
    def boxes_valid(k):
        b = rng.uniform(0, 640, (k, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(4, 64, (k, 2)).astype(np.float32)
        v = np.ones((k,), bool)
        v[k // 2:] = False
        return jnp.asarray(b), jnp.asarray(v)

    b4096, v4096 = boxes_valid(4096)
    b512, v512 = boxes_valid(512)

    flat = jnp.asarray(rng.standard_normal((25200,)).astype(np.float32))

    # qconv inputs (the measured-negative int8 fused-epilogue kernels)
    xq1 = jnp.asarray(rng.integers(-127, 127, (6400, 128), dtype=np.int8))
    wq1 = jnp.asarray(rng.integers(-127, 127, (128, 128), dtype=np.int8))
    sc = jnp.asarray(rng.uniform(1e-3, 1e-2, (128,)).astype(np.float32))
    bi = jnp.asarray(rng.uniform(-1, 1, (128,)).astype(np.float32))
    xq3 = jnp.asarray(rng.integers(-127, 127, (1, 80, 80, 64), dtype=np.int8))
    wq3 = jnp.asarray(rng.integers(-127, 127, (3, 3, 64, 64), dtype=np.int8))
    sc3 = jnp.asarray(rng.uniform(1e-3, 1e-2, (64,)).astype(np.float32))
    bi3 = jnp.asarray(rng.uniform(-1, 1, (64,)).astype(np.float32))

    thr = 998277249  # f32 0.005 bits (the eval score threshold)

    # s1 fused concat+stage-1 inputs: yolov5s@640 level geometry, bf16
    s1_levels = [
        jnp.asarray(rng.standard_normal((2, r, 255)).astype(np.float32)
                    ).astype(jnp.bfloat16)
        for r in (6400, 1600, 400)
    ]

    return [
        # --- shipping production defaults ---
        ("nms_mask_k4096", True,
         lambda a, b: pallas_nms_mask(a, b, 0.45), (b4096, v4096)),
        ("nms_mask_k512", True,
         lambda a, b: pallas_nms_mask(a, b, 0.45), (b512, v512)),
        ("nms_mask_stop300", True,
         lambda a, b: pallas_nms_mask(a, b, 0.45, stop_after=300),
         (b4096, v4096)),
        ("row_fetch_f32", True, lambda a, b: pallas_row_fetch(a, b),
         (tab, phys)),
        ("row_fetch_f32_small", True, lambda a, b: pallas_row_fetch(a, b),
         (tab_s, phys_s)),
        ("row_fetch_bf16_wide", True, lambda a, b: pallas_row_fetch(a, b),
         (cells, pc)),
        ("bisect_count", True,
         lambda a: pallas_bisect_count(a, k=4096, thr_bits=thr), (tab,)),
        ("select_extract", True,
         lambda a, b, c, d, e: pallas_select_extract(a, b, c, d, e,
                                                     thr_bits=thr),
         (tab, phys, p, eq, t)),
        ("lookup_fetch", True,
         lambda a, b: pallas_lookup_fetch(a, b, k=4096), (tab, off2)),
        # --- experimental / measured-negative (in-tree, off by default) ---
        ("compact_select", False,
         lambda a: compact_select(a, 4096, 0.005), (flat,)),
        ("qconv1x1_bf16out", False,
         lambda a, b, c, d: qconv1x1(a, b, c, d), (xq1, wq1, sc, bi)),
        ("qconv1x1_int8out", False,
         lambda a, b, c, d: qconv1x1(a, b, c, d,
                                     inv_out_scale=jnp.float32(127.0)),
         (xq1, wq1, sc, bi)),
        ("qconv3x3_bf16out", False,
         lambda a, b, c, d: qconv3x3(a, b, c, d), (xq3, wq3, sc3, bi3)),
        ("s1_fused_concat_stage1", False,
         lambda a, b, c: fused_cells_stage1([a, b, c], 3, 85),
         tuple(s1_levels)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true",
                    help="execute each case once after compiling")
    ap.add_argument("--strict-all", action="store_true",
                    help="fail the gate on experimental-kernel failures too")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    if not on_tpu:
        print(f"backend={backend}: no Mosaic backend here — degrading to the "
              "jax.export lowering-only check (backend rejections NOT "
              "provable from this host)", flush=True)

    cases = build_cases()
    failures, shipping_failures = [], []
    for name, shipping, fn, xs in cases:
        t0 = time.perf_counter()
        try:
            if on_tpu:
                compiled = jax.jit(fn).lower(*xs).compile()
                if args.run:
                    import numpy as np
                    out = compiled(*xs)
                    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
                status = "ok (compiled+ran)" if args.run else "ok (compiled)"
            else:
                from jax import export as jexport
                exp = jexport.export(jax.jit(fn), platforms=["tpu"])(*xs)
                assert len(exp.mlir_module()) > 1000
                status = "ok (lowered only)"
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            status = f"FAIL {type(e).__name__}: {str(e)[:160]}"
            failures.append(name)
            if shipping:
                shipping_failures.append(name)
        dt = time.perf_counter() - t0
        tag = "ship" if shipping else "exp "
        print(f"[{tag}] {name:24s} {status}  ({dt:.1f}s)", flush=True)

    print(f"\n{len(cases) - len(failures)}/{len(cases)} passed on backend "
          f"'{backend}'", flush=True)
    if shipping_failures:
        print(f"SHIPPING kernel failures: {shipping_failures}", flush=True)
        return 1
    if failures and args.strict_all:
        print(f"experimental failures (strict): {failures}", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
