"""Pallas TPU kernel: fused cells-concat + segmented stage-1 reductions.

Why: the serving floor notes (docs/PERF.md) identify "cells concat +
segmented stage-1" as the ONE postprocess stage measuring above its
pure-traffic floor — 2.5-4.1 ms across configs vs 1.35 ms for one full
read+write pass of the cell table at 815 GB/s (batch 128 @640 bf16).  At
the XLA level the concat (a copy — the cell-major layout keeps the minor
dim intact) and the 2A masked full-lane max-reductions are separate
streams over the same 548 MB table, and every in-XLA reformulation
measured neutral-or-worse (PERF.md negatives -2b, -5).  This kernel is
the "different formulation" that note asks for: ONE pass that reads each
head level block, writes it into its slice of the concatenated cells
table, and computes the per-anchor obj/class max-reductions while the
block is VMEM-resident — the reduction costs no second HBM stream.

Exactness: the kernel reproduces `ops.nms._stage1_per_anchor`'s masked
max-reductions bit-for-bit — same lane masks (obj lane a*kw+4, class
segment [a*kw+5, a*kw+kw)), same -1e4 neg fill, same input dtype; max is
order-insensitive so the per-block evaluation is exact.  The sigmoid
product stays OUTSIDE the kernel (an XLA pass over the tiny (B, A, Na/A)
max tables) so it is the very same XLA sigmoid the in-path and precat
variants use — detections are bit-identical (tests/test_s1_fused.py, and
the on-hardware A/B in tools/experiments/s1fused.py).

Blocking: grid (B, S).  Block rows = the second-smallest level's row
count (every larger level is a 4x multiple of it; the smallest level
rides as one partial final block that Pallas clips at the cells-array
edge).  Each level's BlockSpec index map clamps to its own block range,
so a level's buffer is only re-fetched when the grid actually enters it
(Pallas elides DMA for repeated block indices).  The per-anchor maxes
are emitted in block layout (B, S, A, blk) — minor dim blk keeps the
HBM tile padding negligible (A lives on sublanes) — and reshaped to the
flat cell-major anchor-minor order by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def s1_fused_mode() -> str | None:
    """'compile' on TPU backends (incl. axon), 'interpret' on CPU (how the
    parity tests run), None when the kernel cannot serve the backend —
    callers fall back to the XLA concat + in-path stage-1."""
    if not _HAS_PLTPU:
        return None
    b = jax.default_backend()
    if b in ("tpu", "axon"):
        return "compile"
    if b == "cpu":
        return "interpret"
    return None


def _plan_blocks(row_counts):
    """Choose the block row count and per-level step ranges.

    Returns (blk, boundaries) where boundaries[l] is the first grid step
    of level l (boundaries[-1] == total steps), or None when the level
    geometry doesn't fit the blocking contract (every level except the
    last must be a multiple of blk; the last must be <= blk)."""
    if not row_counts:
        return None
    if len(row_counts) == 1:
        blk = row_counts[0]
        return blk, [0, 1]
    blk = row_counts[-2]  # second-smallest level (levels shrink 4x)
    steps = []
    for r in row_counts[:-1]:
        if r % blk != 0:
            return None
        steps.append(r // blk)
    if row_counts[-1] > blk:
        return None
    steps.append(1)
    boundaries = [0]
    for s in steps:
        boundaries.append(boundaries[-1] + s)
    return blk, boundaries


def _kernel(*refs, n_levels, boundaries, num_anchors, kw):
    in_refs = refs[:n_levels]
    cells_ref, obj_ref, cls_ref = refs[n_levels:]
    j = pl.program_id(1)

    for lvl in range(n_levels):
        start, stop = boundaries[lvl], boundaries[lvl + 1]

        @pl.when((j >= start) & (j < stop))
        def _(lvl=lvl):
            rows = in_refs[lvl][0]  # (r, A*kw) — r == blk except last level
            r = rows.shape[0]
            cells_ref[0, :r, :] = rows
            lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
            neg = jnp.asarray(-1.0e4, rows.dtype)
            for a in range(num_anchors):
                base = a * kw
                obj = jnp.max(jnp.where(lane == base + 4, rows, neg), axis=1)
                cls = jnp.max(
                    jnp.where((lane >= base + 5) & (lane < base + kw), rows, neg),
                    axis=1,
                )
                obj_ref[0, 0, a, :r] = obj
                cls_ref[0, 0, a, :r] = cls


def fused_cells_stage1(levels, num_anchors: int, kw: int, *, interpret=False):
    """One-pass cells concat + per-anchor stage-1 screen.

    levels: list of (B, rows_l, A*kw) conv-layout head outputs (the
    (B, H, W, C) -> (B, H*W, C) reshape is layout-free).  Returns
    (cells (B, n_cells, A*kw), per_anchor (B, n_cells*A)) with cells ==
    jnp.concatenate(levels, axis=1) and per_anchor bit-identical to
    `_stage1_per_anchor(cells).reshape(B, -1)` (reference semantics:
    yolort/models/box_head.py:388-429 score screen).  Returns None when
    the level geometry doesn't fit the blocking contract — callers fall
    back to the XLA path."""
    plan = _plan_blocks([lv.shape[1] for lv in levels])
    if plan is None:
        return None
    blk, boundaries = plan
    n_levels = len(levels)
    B = levels[0].shape[0]
    C = levels[0].shape[2]
    n_cells = sum(lv.shape[1] for lv in levels)
    S = boundaries[-1]
    dtype = levels[0].dtype

    in_specs = []
    for lvl, lv in enumerate(levels):
        start = boundaries[lvl]
        nblk = max(boundaries[lvl + 1] - start, 1)
        rows_blk = min(lv.shape[1], blk)
        in_specs.append(
            pl.BlockSpec(
                (1, rows_blk, C),
                functools.partial(
                    lambda i, j, start, nblk: (
                        i,
                        jnp.clip(j - start, 0, nblk - 1),
                        0,
                    ),
                    start=start,
                    nblk=nblk,
                ),
            )
        )

    out_shapes = (
        jax.ShapeDtypeStruct((B, n_cells, C), dtype),
        jax.ShapeDtypeStruct((B, S, num_anchors, blk), dtype),
        jax.ShapeDtypeStruct((B, S, num_anchors, blk), dtype),
    )
    out_specs = (
        pl.BlockSpec((1, blk, C), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, 1, num_anchors, blk), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, num_anchors, blk), lambda i, j: (i, j, 0, 0)),
    )

    cells, obj, cls = pl.pallas_call(
        functools.partial(
            _kernel,
            n_levels=n_levels,
            boundaries=boundaries,
            num_anchors=num_anchors,
            kw=kw,
        ),
        grid=(B, S),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*levels)

    # sigmoid product OUTSIDE the kernel: the same XLA sigmoid the in-path
    # stage-1 applies, on identical max values -> bit-identical scores.
    per = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)  # (B, S, A, blk)
    # flat cell-major anchor-minor order: index (cell)*A + a with
    # cell = step*blk + r  ->  (j, r, a) flattening; the partial last
    # level's out-of-range block tail lands past n_cells*A and slices off.
    per = per.transpose(0, 1, 3, 2).reshape(B, -1)[:, : n_cells * num_anchors]
    return cells, per
