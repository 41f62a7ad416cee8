"""Pallas TPU kernel for exact top-k stream compaction.

The exact-eval NMS path must extract the top-k (anchor, class) score pairs
above a threshold from a ~328k score vector per image (reference semantics:
box_head.py:388-410 keeps *all* pairs above score_thresh; the fixed-shape
TPU stand-in is exact top-k with threshold re-applied).  The k-th value is
found by branchless bisection (ops.nms._bisect_kth_bits, ~5 ms at batch
128); the expensive part is *extraction*: XLA's gather formulation issues k
random 128-lane row reads per image (latency-bound, ~20 ms at batch 128).

This kernel replaces the gathers with a single streaming pass:

  * grid over 1024-element blocks (8 chunk-rows of 128 lanes);
  * per chunk-row, the within-chunk rank comes from a lower-triangular
    128x128 matmul on the MXU (cumsum-as-matmul — no cross-lane shifts);
  * a (128 -> 256)-lane one-hot placement matrix scatters the chunk's
    selected [value; flat-index] payload into a 2-row window at the chunk's
    precomputed output offset (f32 matmul with 0/1 one-hots is exact);
  * the window is accumulated into the (ROWS,128) output block, which lives
    in VMEM across the sequential grid (disjoint target positions by
    construction, so += never collides);
  * chunks with no selected entries are skipped via @pl.when, so the cost
    scales with the above-threshold candidate density, not the domain size.

Two tiers keep the exact lax.top_k-style contract: strictly-above-boundary
entries first, then boundary ties in index order, truncated at k.
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

_W = 128      # lanes per chunk
_RPB = 8      # chunk-rows per grid step (f32 min tile is (8,128))


def pallas_compact_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _compact_kernel(meta_ref, vals_ref, out_v_ref, out_i_ref,
                    *, k: int, thr_bits: int, rows_out: int):
    # meta (1,5,8) int32: rows 0/1 = per-chunk gt/eq counts, rows 2/3 = their
    # exclusive output offsets, row 4 lane 0 = the k-th value's f32 bits.
    # All selection compares run in bit space (positive IEEE-754 floats order
    # identically as int32 bits), so no scalar float plumbing is needed.
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_v_ref[:, :] = jnp.zeros((rows_out, _W), jnp.float32)
        out_i_ref[:, :] = jnp.zeros((rows_out, _W), jnp.float32)

    t_bits = meta_ref[0, 4, 0]
    vals = vals_ref[0]  # (8, 128) f32
    vbits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    lt = (
        jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 1)
    ).astype(jnp.float32)  # inclusive-cumsum-as-matmul
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)

    for row in range(_RPB):
        v = vals[row : row + 1, :]  # (1, 128)
        vb = vbits[row : row + 1, :]
        valid = vb > thr_bits
        base = (step * _RPB + row) * _W
        gidx = (lane + base).astype(jnp.float32)
        for tier in range(2):
            cnt = meta_ref[0, tier, row]
            off = meta_ref[0, 2 + tier, row]

            @pl.when((cnt > 0) & (off < k))
            def _place(v=v, vb=vb, valid=valid, gidx=gidx, cnt=cnt, off=off, tier=tier):
                m = valid & ((vb > t_bits) if tier == 0 else (vb == t_bits))
                mf = m.astype(jnp.float32)
                incl = jnp.dot(mf, lt, preferred_element_type=jnp.float32)
                rank = (incl - mf).astype(jnp.int32)  # exclusive rank
                # fold the mask (and the k-truncation of boundary ties) into
                # tgt as an out-of-range sentinel — Mosaic can't minor-dim
                # reshape i1 vectors, and 256 never matches the 256-wide iota
                tgt = jnp.where(
                    m & ((off + rank) < k), (off % _W) + rank, 2 * _W
                )  # in [0, 255] or sentinel (Mosaic can't minor-reshape i1,
                #    so the mask folds into tgt instead)
                tgt_col = tgt.reshape(_W, 1)
                # the 2-row output window as two 128-wide one-hot matmuls
                # (a (2,256)->(2,2,128) lane-split is not lane-preserving;
                # two (128,128) one-hots avoid any relayout)
                place0 = (tgt_col == iota1).astype(jnp.float32)
                place1 = (tgt_col == iota1 + _W).astype(jnp.float32)
                payload = jnp.concatenate([v, gidx], axis=0)  # (2, 128)
                dot = functools.partial(
                    jax.lax.dot_general,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                w0 = dot(payload, place0)  # (2,128): [values; indices] row r
                w1 = dot(payload, place1)  # (2,128): row r+1
                r = off // _W
                out_v_ref[pl.ds(r, 2), :] += jnp.concatenate(
                    [w0[0:1, :], w1[0:1, :]], axis=0
                )
                out_i_ref[pl.ds(r, 2), :] += jnp.concatenate(
                    [w0[1:2, :], w1[1:2, :]], axis=0
                )


@functools.partial(jax.jit, static_argnames=("k", "score_thresh", "sort", "interpret"))
def compact_select(flat: jax.Array, k: int, score_thresh: float, sort: bool = True,
                   interpret: bool = False):
    """Exact top-k selection of scores > score_thresh via bisection + the
    streaming compaction kernel.  Same contract as
    ops.nms.select_topk_threshold (f32-exact: selected set, values, and tie
    order match masked lax.top_k).  flat: (n,) f32/bf16; returns (values,
    indices) with empty slots valued -1.0 / index 0."""
    from yolort_tpu.ops.nms import _bisect_kth_bits

    flat = flat.astype(jnp.float32)
    n = flat.shape[0]
    k = min(k, n)
    blk = _RPB * _W
    pad = (-n) % blk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    npad = flat.shape[0]
    nchunks = npad // _W
    steps = npad // blk

    import numpy as np

    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    thr_bits = int(np.float32(score_thresh).view(np.int32))
    valid = bits > thr_bits
    t_bits = _bisect_kth_bits(bits, valid, k)
    t = jax.lax.bitcast_convert_type(t_bits, jnp.float32)

    m_gt = valid & (flat > t)
    m_eq = valid & (flat == t)
    cnt_gt = jnp.sum(m_gt.reshape(nchunks, _W), axis=1, dtype=jnp.int32)
    cnt_eq = jnp.sum(m_eq.reshape(nchunks, _W), axis=1, dtype=jnp.int32)
    cnt = jnp.stack([cnt_gt, cnt_eq])  # (2, C)
    offs = (jnp.cumsum(cnt.reshape(-1)) - cnt.reshape(-1)).reshape(2, nchunks)
    total = offs[1, -1] + cnt[1, -1]

    meta = jnp.concatenate(
        [
            cnt.reshape(2, steps, _RPB).transpose(1, 0, 2),
            offs.astype(jnp.int32).reshape(2, steps, _RPB).transpose(1, 0, 2),
            jnp.broadcast_to(t_bits.reshape(1, 1, 1), (steps, 1, _RPB)),
        ],
        axis=1,
    )  # (steps, 5, 8) int32

    rows_out = (k + _W - 1) // _W + 1
    smem = dict(memory_space=pltpu.SMEM) if (_HAS_PLTPU and not interpret) else {}
    out_v, out_i = pl.pallas_call(
        functools.partial(
            _compact_kernel, k=k, thr_bits=int(thr_bits), rows_out=rows_out
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 5, _RPB), lambda i: (i, 0, 0), **smem),
            pl.BlockSpec((1, _RPB, _W), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows_out, _W), lambda i: (0, 0)),
            pl.BlockSpec((rows_out, _W), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_out, _W), jnp.float32),
            jax.ShapeDtypeStruct((rows_out, _W), jnp.float32),
        ],
        interpret=interpret,
    )(
        meta,
        flat.reshape(steps, _RPB, _W),
    )

    vals = out_v.reshape(-1)[:k]
    idx = out_i.reshape(-1)[:k].astype(jnp.int32)
    ok = jnp.arange(k, dtype=jnp.int32) < jnp.minimum(total, k)
    vals = jnp.where(ok, vals, -1.0)
    idx = jnp.where(ok, idx, 0)
    if sort:
        neg, idx = jax.lax.sort_key_val(-vals, idx)
        vals = -neg
    return vals, idx
