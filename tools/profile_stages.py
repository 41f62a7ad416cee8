#!/usr/bin/env python
"""Stage-wise profiling of the inference pipeline on the current backend.

Times (a) backbone+PAN+head, (b) +decode, (c) topk, (d) NMS (xla / pallas)
separately to locate the bottleneck.  Each stage returns a scalar that is
fetched to host (block_until_ready does not block through the axon relay);
the trivial-fetch RTT is measured and subtracted.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT = 0.0


def timed(fn, *args, iters=10, warmup=2, label=""):
    # compile each stage prefix with the SHIPPING compiler options so the
    # stage deltas attribute the production program (PERF.md win 13)
    from yolort_tpu.utils.compile_options import tpu_compiler_options

    f = jax.jit(fn, compiler_options=tpu_compiler_options())
    t0 = time.perf_counter()
    float(f(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    best = max(min(ts) - _RTT, 0.0)
    print(f"{label:45s} {best*1000:9.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return best


def main():
    global _RTT
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--topk", type=int, default=4096)
    ap.add_argument("--score", type=float, default=None,
                    help="score threshold for the postprocess stages "
                         "(default: the arch's, 0.005 for the cells rows); "
                         "pass 0.25 with --topk 512 for the serving config")
    ap.add_argument("--calibrate", action="store_true",
                    help="shift the head objectness bias exactly like "
                         "bench.py (calibrate_candidate_density) so the "
                         "NMS/suppression rows see the bench's candidate "
                         "load instead of the near-empty random-init one")
    ap.add_argument("--stages", default="head,decode,topk,nms_xla,nms_pallas,full")
    ap.add_argument("--device", default=None,
                    help="jax platform override (e.g. cpu); the env-pinned "
                         "JAX_PLATFORMS can only be overridden via "
                         "jax.config AFTER import (axon sitecustomize)")
    ap.add_argument("--pallas", action="store_true",
                    help="route the cells-path fetches through the in-VMEM "
                         "kernels (YOLORT_PALLAS_FETCH hook) for the "
                         "'cells' stages")
    args = ap.parse_args()

    if args.pallas:
        import os

        os.environ["YOLORT_PALLAS_FETCH"] = "1"

    if args.device:
        jax.config.update("jax_platforms", args.device)
    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("os").environ.get("YOLORT_JAX_CACHE", "/tmp/yolort_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.ops import nms as nms_ops
    from yolort_tpu.utils import cast_floating

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    stages = args.stages.split(",")

    mkw = {"pre_nms_topk": args.topk}
    if args.score is not None:
        mkw["score_thresh"] = args.score
    model = build_yolo(args.arch, **mkw)
    params = cast_floating(model.init(jax.random.PRNGKey(0)), dtype)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.batch, args.size, args.size, 3)),
        dtype,
    )
    if args.calibrate:
        # the bench's honesty calibration: raw uint8 frames + identity
        # letterbox plan, bias shifted until score>0.25 pairs/img >= 120
        from bench import calibrate_candidate_density
        from yolort_tpu.models.transform import LetterboxPlan

        s = args.size
        raw = jnp.asarray(np.random.default_rng(1).integers(
            0, 255, (args.batch, s, s, 3), dtype=np.uint8))
        plan = LetterboxPlan((s, s), (s, s), (s, s), (0, 0))
        params, delta, dens = calibrate_candidate_density(
            model, params, raw, dtype, plan)
        print(f"calibrated: obj_bias_shift={delta:.3f} "
              f"candidates/img@0.25={dens:.0f}", flush=True)
    print(f"backend={jax.default_backend()} batch={args.batch} size={args.size} dtype={args.dtype}")

    # RTT calibration
    triv = jax.jit(lambda x: jnp.sum(x[0, 0, 0]))
    float(triv(x))
    _RTT = min(
        (lambda: (lambda t0: (float(triv(x)), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(5)
    )
    print(f"fetch RTT: {_RTT*1000:.2f} ms", flush=True)

    if "head" in stages:
        timed(lambda p, x: sum(jnp.sum(o.astype(jnp.float32)) for o in model.head_outputs(p, x)),
              params, x, label="backbone+pan+head")
    if "decode" in stages:
        timed(lambda p, x: jnp.sum(model.decode(p, x)), params, x, label="+decode")
    pred = jax.jit(model.decode)(params, x)
    if "topk" in stages:
        def topk_only(pred):
            scores = pred[..., 5:] * pred[..., 4:5]
            flat = scores.reshape(scores.shape[0], -1)
            v, i = jax.lax.top_k(flat, args.topk)
            return jnp.sum(v) + jnp.sum(i)
        timed(topk_only, pred, label=f"decode-out topk(k={args.topk})")
    for impl in ("xla", "pallas"):
        if f"nms_{impl}" not in stages:
            continue
        if impl == "pallas" and jax.default_backend() == "cpu":
            continue
        def post(pred, impl=impl):
            det = nms_ops.batched_postprocess(
                pred, num_classes=model.num_classes, score_thresh=model.score_thresh,
                nms_thresh=model.nms_thresh, detections_per_img=300,
                pre_nms_topk=args.topk, nms_tile_size=model.nms_tile_size, nms_impl=impl,
            )
            return jnp.sum(det.num)
        try:
            timed(post, pred, label=f"postprocess nms_impl={impl}")
        except Exception as e:
            print(f"postprocess nms_impl={impl} FAILED: {type(e).__name__}: {str(e)[:200]}")
    if "cells" in stages:
        profile_cells(args, model, params, x)
    if "full" in stages:
        dt = timed(lambda p, x: jnp.sum(model(p, x).num), params, x, label="full pipeline")
        if dt > 0:
            print(f"imgs/sec: {args.batch/dt:.1f}")


def profile_cells(args, model, params, x):
    """Cumulative-prefix profile of the cell-major eval postprocess
    (flatten_pad='cell' — the auto path for topk >= 2048 on TPU): cells
    concat + segmented stage-1, sort-select, cell-row gather, segment
    extract + box decode, stage-2 pair select, box gather, NMS+compact.
    Differences between consecutive rows are the per-stage costs.

    With YOLORT_PALLAS_FETCH=1 (--pallas) the cell-row fetch, stage-2
    select, and box fetch run through the in-VMEM kernels; the default
    rows use row_gather='pallas_bisect' (the shipping TPU hybrid) on
    backends the kernels can serve and the XLA path elsewhere."""
    import os as _os
    from functools import partial

    from yolort_tpu.ops.pallas.lookup_kernel import pallas_fetch_mode

    _pal = _os.environ.get("YOLORT_PALLAS_FETCH") == "1"
    _mode = pallas_fetch_mode()
    if _pal and _mode is None:
        print("pallas kernels unavailable on this backend; "
              "profiling the XLA path", flush=True)
        _pal = False
    _interp = _mode == "interpret"
    if _pal:
        _rg = "pallas_full"
    elif _mode is not None and jax.default_backend() not in ("cpu",):
        _rg = "pallas_bisect"  # the shipping TPU default (v5e A/B winner)
    else:
        _rg = "auto"

    from yolort_tpu.models.head import (
        PAD_LOGIT,
        anchor_props_from_index,
        padded_num_outputs,
    )
    from yolort_tpu.ops.nms import (
        _compact_detections,
        cxcywh_to_xyxy,
        nms_keep_mask,
        select_topk_indices,
        select_topk_indices_compact,
        select_topk_threshold,
    )

    heads = jax.jit(model.head_outputs)(params, x)
    heads = [jnp.asarray(o) for o in heads]
    grid_sizes = tuple(tuple(o.shape[1:3]) for o in heads)
    strides, anchor_grids = model.strides, model.anchor_grids
    A = model.num_anchors
    nc = model.num_classes
    kw = 5 + nc
    k = args.topk
    k1 = k + 8
    score_thresh = 0.005 if args.score is None else args.score
    # mirror resolve_nms_config's k1-resolved stage-1 select so the
    # cumulative budget profiles the SHIPPING program (compact at serving
    # k1, whole-domain sort at eval k1)
    _s1_compact = k1 <= 1024
    _s1_sel = (select_topk_indices_compact if _s1_compact
               else select_topk_indices)
    _s1_label = "compact" if _s1_compact else "sortidx"

    def cells_of(hs):
        return jnp.concatenate(
            [o.reshape(o.shape[0], g[0] * g[1], o.shape[3])
             for o, g in zip(hs, grid_sizes)], axis=1)

    def stage1_scores(cells):
        clane = jnp.arange(A * kw, dtype=jnp.int32)
        neg = jnp.asarray(-1.0e4, cells.dtype)
        per = []
        for a in range(A):
            base = a * kw
            obj_l = jnp.max(jnp.where(clane == base + 4, cells, neg), axis=-1)
            cls_l = jnp.max(
                jnp.where((clane >= base + 5) & (clane < base + kw), cells, neg),
                axis=-1)
            per.append(jax.nn.sigmoid(cls_l) * jax.nn.sigmoid(obj_l))
        return jnp.stack(per, axis=-1).reshape(cells.shape[0], -1)

    def sel_rows(cells):
        pa = stage1_scores(cells)
        def one(f, c):
            ok, a_sel = _s1_sel(f, k1)
            if _pal:
                from yolort_tpu.ops.pallas.lookup_kernel import pallas_row_fetch
                return ok, a_sel, pallas_row_fetch(
                    c, a_sel // A, interpret=_interp)[:, : A * kw]
            return ok, a_sel, c[a_sel // A]
        return jax.vmap(one)(pa.astype(jnp.float32), cells)

    def seg_extract(a_sel, crows):
        aa = a_sel % A
        segs = [crows[:, a * kw:(a + 1) * kw] for a in range(A)]
        sel = segs[-1]
        for a in range(A - 2, -1, -1):
            sel = jnp.where((aa == a)[:, None], segs[a], sel)
        kp = padded_num_outputs(kw)
        if kp != kw:
            sel = jnp.concatenate(
                [sel, jnp.full((sel.shape[0], kp - kw), PAD_LOGIT, sel.dtype)], axis=1)
        return jax.nn.sigmoid(sel.astype(jnp.float32))

    def mk_sel(hs):
        ok, a_sel, crows = sel_rows(cells_of(hs))
        def one(ok1, a1, cr):
            ss = seg_extract(a1, cr)
            g, s, st = anchor_props_from_index(a1, grid_sizes, strides, anchor_grids)
            xy = (ss[:, 0:2] * 2.0 - 0.5 + g) * st[:, None]
            wh = (ss[:, 2:4] * 2.0) ** 2 * s
            bx = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))
            scores = jnp.where(ok1[:, None], ss[:, 5:5 + nc] * ss[:, 4:5], 0.0)
            return scores, bx
        return jax.vmap(one)(ok, a_sel, crows)

    timed(lambda hs: jnp.sum(stage1_scores(cells_of(hs)).astype(jnp.float32)),
          heads, label="cells concat + stage-1")
    timed(lambda hs: jnp.sum(jax.vmap(lambda f: _s1_sel(f, k1)[1])(
        stage1_scores(cells_of(hs)).astype(jnp.float32)).astype(jnp.float32)),
          heads, label=f"+ stage-1 select ({_s1_label})")
    timed(lambda hs: jnp.sum(sel_rows(cells_of(hs))[2].astype(jnp.float32)),
          heads, label="+ cell-row gather")
    def p_seg(hs):
        scores, bx = mk_sel(hs)
        return jnp.sum(scores) + jnp.sum(bx)
    timed(p_seg, heads, label="+ seg extract + box decode")

    def p_sel(hs):
        scores, bx = mk_sel(hs)
        def one(sc):
            v, i = select_topk_threshold(sc.reshape(-1), k, score_thresh,
                                         row_gather=_rg)
            return jnp.sum(v) + jnp.sum(i)
        return jnp.sum(jax.vmap(one)(scores)) + jnp.sum(bx)
    timed(p_sel, heads, label="+ stage-2 pair select")

    def p_full(hs):
        scores, bx = mk_sel(hs)
        def one(sc, b):
            v, i = select_topk_threshold(sc.reshape(-1), k, score_thresh,
                                         row_gather=_rg)
            labels = (i % nc).astype(jnp.int32)
            if _pal:
                from yolort_tpu.ops.pallas.lookup_kernel import pallas_row_fetch
                cb = pallas_row_fetch(b, i // nc, interpret=_interp)[:, :4]
            else:
                cb = b[i // nc]
            valid = v > score_thresh
            mx = jnp.max(jnp.where(valid[:, None], cb, 0.0))
            ob = cb + (labels.astype(cb.dtype) * (mx + 1.0))[:, None]
            keep = nms_keep_mask(ob, valid, model.nms_thresh,
                                 tile_size=model.nms_tile_size,
                                 impl="auto", stop_after=300)
            return _compact_detections(keep, cb, v, labels, 300)[4]
        return jnp.sum(jax.vmap(one)(scores, bx))
    timed(p_full, heads, label="+ box gather + NMS + compact")


if __name__ == "__main__":
    main()
