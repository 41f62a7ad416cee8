"""Fixed-shape batched NMS for TPU.

The reference runs a per-image Python loop calling torchvision's CUDA/CPU
``batched_nms`` (yolort/models/box_head.py:414-427, semantics also pinned by
the hand-rolled C version in deployment/ncnn/main.cpp:87-161).  That shape-
dynamic pattern cannot live inside one XLA program, so this module re-designs
it TPU-first:

  1. candidate selection = top-K over the flattened (anchor, class) score
     matrix with sub-threshold entries masked out — a fixed-shape superset of
     the reference's ``torch.where(scores > score_thresh)``;
  2. class-aware NMS via the coordinate-offset trick (torchvision
     ``batched_nms`` / reference v5/utils/general.py:601);
  3. greedy suppression as a *tiled fixed-point iteration*: for each tile of
     candidates (already finalized tiles act as suppressors), iterate
     ``alive -> valid & ~any(sup & alive)`` to convergence.  Because the
     suppression matrix is strictly upper-triangular in score order, the
     iteration converges to exactly the sequential-greedy result (earlier
     indices stabilize first and never flip back).

Everything is fixed-shape: outputs are padded to ``detections_per_img`` with
a validity mask, mirroring the EfficientNMS_TRT contract the reference uses
for TensorRT (relay/trt_graphsurgeon.py:223-244).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import os

import jax
import jax.numpy as jnp


def box_area(b):
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)


def box_iou_matrix(a, b):
    """Pairwise IoU, xyxy. a: (M,4), b: (N,4) -> (M,N).

    Matches torchvision.ops.box_iou (no +1 correction)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def cxcywh_to_xyxy(box):
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def _self_suppress(sup: jax.Array, valid: jax.Array) -> jax.Array:
    """Greedy NMS inside one tile via fixed-point iteration.

    sup: (T,T) bool, sup[i,j] True iff box i suppresses box j (iou>thr and
    i<j in score order). valid: (T,) candidate validity. Returns alive mask
    equal to the sequential greedy scan result.
    """

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        alive, _ = state
        suppressed = jnp.any(sup & alive[:, None], axis=0)
        new_alive = valid & ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return alive


def greedy_nms_mask(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile_size: int = 256,
    stop_after: int = 0,
) -> jax.Array:
    """Greedy NMS keep-mask over score-sorted candidates.

    boxes: (K,4) xyxy sorted by descending score; valid: (K,) bool.
    Returns keep: (K,) bool — identical to sequential greedy NMS with strict
    ``iou > iou_thresh`` suppression (torchvision.ops.nms semantics).

    stop_after > 0: early exit once that many keeps are finalized (keeps are
    score-ordered, so the top-``stop_after`` result is already exact); tiles
    past that point pass validity through — see pallas_nms_mask.
    """
    k = boxes.shape[0]
    t = min(tile_size, k)
    if k % t != 0:
        pad = t - k % t
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    kp = boxes.shape[0]
    num_tiles = kp // t
    idx = jnp.arange(kp)
    stop = stop_after if stop_after > 0 else kp

    def tile_body(i, alive):
        start = i * t
        tile_boxes = jax.lax.dynamic_slice(boxes, (start, 0), (t, 4))
        tile_valid = jax.lax.dynamic_slice(valid, (start,), (t,))
        iou = box_iou_matrix(tile_boxes, boxes)  # (T, Kp)
        # suppression by finalized earlier tiles
        prev = alive & (idx < start)
        sup_prev = jnp.any((iou > iou_thresh) & prev[None, :], axis=1)
        tile_valid = tile_valid & ~sup_prev
        # within-tile greedy
        iou_tt = jax.lax.dynamic_slice(iou, (0, start), (t, t))
        tri = jnp.arange(t)[:, None] < jnp.arange(t)[None, :]  # i suppresses j>i
        sup_tt = (iou_tt > iou_thresh) & tri
        tile_alive = _self_suppress(sup_tt, tile_valid)
        return jax.lax.dynamic_update_slice(alive, tile_alive, (start,))

    def cond(state):
        i, alive = state
        kept = jnp.sum((alive & (idx < i * t)).astype(jnp.int32))
        return (i < num_tiles) & (kept < stop)

    def body(state):
        i, alive = state
        return i + 1, tile_body(i, alive)

    _, alive = jax.lax.while_loop(cond, body, (jnp.int32(0), valid))
    return alive[:k]


def nms_keep_mask(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile_size: int = 256,
    impl: str = "auto",
    stop_after: int = 0,
) -> jax.Array:
    """Dispatch greedy NMS to the Pallas TPU kernel or the XLA fallback.

    impl: 'auto' (Pallas on TPU, XLA elsewhere) | 'pallas' | 'xla'.
    stop_after: early-exit keep budget (0 = run all tiles)."""
    if impl != "xla":
        from yolort_tpu.ops.pallas.nms_kernel import pallas_nms_available, pallas_nms_mask

        k = boxes.shape[0]
        if impl == "pallas" or (pallas_nms_available() and k % tile_size == 0):
            return pallas_nms_mask(boxes, valid, iou_thresh, tile=tile_size,
                                   stop_after=stop_after)
    return greedy_nms_mask(boxes, valid, iou_thresh, tile_size=tile_size,
                           stop_after=stop_after)


def _bisect_kth_bits(bits: jax.Array, valid: jax.Array, k: int,
                     passes: int = 9) -> jax.Array:
    """Exact k-th-largest value (as monotonic float bits) among valid
    entries, via a branchless 16-ary search on the bit pattern — ~100x
    cheaper than a 328k sort on TPU.  Positive IEEE-754 floats compare
    identically as their signed-int bit patterns (works for f32/int32 and
    bf16/int16 alike).  Each pass reads the data once and counts against 15
    pivots simultaneously (compute-cheap on the VPU, HBM-bound): 9 passes
    shrink the 2^31 int32 range to a point (4 suffice for int16).  The
    converged ``lo`` satisfies count(bits >= lo) >= k > count(bits >= lo+1)
    exactly (or lo = min valid bits when fewer than k valid entries exist,
    selecting them all)."""
    arms = 16
    dt = bits.dtype

    def body(_, state):
        lo, hi = state  # int32 scalars; invariant: count(>=lo) >= k > count(>=hi)
        step = jnp.maximum((hi - lo) // arms, 1)
        pivots = lo + step * jnp.arange(1, arms, dtype=jnp.int32)  # (15,)
        pivots = jnp.minimum(pivots, hi)
        # 15 separate masked count-reductions: XLA fuses them into ONE
        # bandwidth-speed stream with 15 accumulators.  The broadcast
        # formulation ((n,15) compare then axis-0 sum) is ~6x slower — the
        # (n,15) intermediate defeats the reduce fusion.
        counts = jnp.stack(
            [
                jnp.sum((masked >= pivots[i].astype(dt)).astype(jnp.int32))
                for i in range(arms - 1)
            ]
        )  # (15,) descending
        ge = counts >= k
        m = jnp.sum(ge.astype(jnp.int32))  # pivots still satisfying the lo invariant
        new_lo = jnp.where(m > 0, lo + step * m, lo)
        new_hi = jnp.where(m < arms - 1, lo + step * (m + 1), hi)
        return new_lo, jnp.minimum(new_hi, hi)

    if dt == jnp.int16:
        sentinel, hi0 = jnp.int32(0x4000), jnp.int32(0x4000)  # bits of bf16 2.0
    else:
        sentinel, hi0 = jnp.int32(2**30), jnp.int32(0x40000000)  # bits of f32 2.0
    # fold the valid mask into the data ONCE (dt_min sits below every pivot,
    # so masked entries never count) — halves the per-pass stream
    masked = jnp.where(valid, bits, jnp.asarray(jnp.iinfo(dt).min, dt))
    lo0 = jnp.min(jnp.where(valid, bits.astype(jnp.int32), sentinel))  # lowest valid
    lo, _ = jax.lax.fori_loop(0, passes, body, (lo0, hi0))
    return lo.astype(dt)


def select_topk_indices(
    flat: jax.Array, k: int, score_thresh: float = 0.0
) -> Tuple[jax.Array, jax.Array]:
    """Indices-only exact top-k: the stage-1 anchor screen without the
    stream-compaction machinery.

    ``select_topk_threshold`` spends most of its time producing *values*
    for each output slot (chunk counts -> slot->chunk lookup -> k-row chunk
    gather -> in-lane rank extract); a stage-1 caller only consumes the
    selected index SET plus slot occupancy (stage 2 rescores from the
    gathered logits rows).  This variant bisects the exact k-th value and
    then runs ONE single-operand int32 sort of ``tier<<B | index`` keys —
    the strictly-above entries land first (in index order), boundary ties
    fill the remaining slots (in index order), exactly the set contract of
    ``select_topk_threshold(..., sort=False)``.  The k-row gather
    (latency-bound, ~13 ns/row on XLA's TPU gather *regardless of table
    size* — measured 6.0 ms for 4096 rows from a 197-row table at batch
    128) is replaced by a 25k-element single-operand sort.

    Returns (ok, idx): ``ok`` marks occupied slots, ``idx`` the selected
    flat indices (unspecified index for unoccupied slots).
    """
    n = flat.shape[0]
    k = min(k, n)
    bits = jax.lax.bitcast_convert_type(flat.astype(jnp.float32), jnp.int32)
    thr_bits = jax.lax.bitcast_convert_type(
        jnp.asarray(score_thresh, jnp.float32), jnp.int32
    )
    valid = bits > thr_bits
    t = _bisect_kth_bits(bits, valid, k)
    gt = valid & (bits >= t + 1)
    eq = valid & (bits == t)
    tier = jnp.where(gt, 0, jnp.where(eq, 1, 2))  # (n,) in {0,1,2}
    shift = max(int(n - 1).bit_length(), 1)
    iota = jnp.arange(n, dtype=jnp.int32)
    key = (tier << shift) | iota
    skey = jax.lax.sort(key, dimension=0)
    idx = skey[:k] & ((1 << shift) - 1)
    total = jnp.sum((tier < 2).astype(jnp.int32))
    ok = jnp.arange(k, dtype=jnp.int32) < jnp.minimum(total, k)
    return ok, idx


def mxu_row_lookup(bits: jax.Array, phys: jax.Array) -> jax.Array:
    """Exact row gather ``bits[phys]`` as one-hot int8 MXU matmuls.

    bits: (m, w) int32/int16 bit patterns; phys: (k,) int32 in [0, m).
    Returns (k, w) with bit-exact rows.

    Why: XLA's TPU gather is latency-bound at ~13-21 ns/row regardless of
    row width — at k=4096, batch 128 that is ~7 ms per gather in the eval
    postprocess.  For SMALL tables the same lookup is a (k, m) x (m, w)
    matmul: the one-hot operand is exact in int8, each table int is split
    into byte planes (s8 in [-128,127] after a -128 offset), the planes ride
    ONE dot along a widened minor dim, and the s32 results reassemble the
    original bit pattern exactly (int32 wrap-around is modulo-2^32 correct).
    Each output row receives exactly one 1 in its one-hot row, so the +128
    offset correction is the constant 128 per plane.

    MEASURED NEGATIVE RESULT on v5e (kept as a tested option): at the eval
    config's sizes (k=4096, m=197/2565, batch 128) this is SLOWER than the
    gather it replaces (eval 1595 vs 1723 imgs/s) — the k x m one-hot
    bytes, the byte-plane prep, and the 4x-wide s32 matmul output are more
    HBM traffic than the ~13 ns/row gather latency is worth.  docs/PERF.md
    "Negative results".
    """
    m, w = bits.shape
    nbytes = bits.dtype.itemsize
    xi = bits.astype(jnp.int32)
    if nbytes == 4:
        # shared plane construction with the in-VMEM kernel (exactness
        # contract lives in one place)
        from yolort_tpu.ops.pallas.lookup_kernel import byte_planes

        table = byte_planes(xi)  # (m, 4*w) s8
    else:
        planes = [
            (((xi >> (8 * i)) & 0xFF) - 128).astype(jnp.int8) for i in range(nbytes)
        ]
        table = jnp.concatenate(planes, axis=1)  # (m, nbytes*w) s8
    onehot = (
        phys[:, None] == jnp.arange(m, dtype=phys.dtype)[None, :]
    ).astype(jnp.int8)  # (k, m), exactly one 1 per row
    prod = jax.lax.dot_general(
        onehot, table, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # (k, nbytes*w)
    out = jnp.zeros((phys.shape[0], w), jnp.int32)
    for i in range(nbytes):
        byte = prod[:, i * w : (i + 1) * w] + 128  # undo the s8 offset
        out = out + (byte << (8 * i))  # wraps; bit pattern stays exact
    return out.astype(bits.dtype)


def mxu_narrow_lookup(table: jax.Array, idx: jax.Array, block: int = 32) -> jax.Array:
    """Exact ``table[idx]`` for NARROW float tables ((m, p) with small p,
    e.g. the (k1, 4) decoded-boxes table) via a two-level one-hot lookup.

    Level 1 fetches a BLOCK of ``block`` consecutive rows per slot with one
    mxu_row_lookup (the one-hot shrinks m-fold to m/block — the direct
    (k, m) one-hot's HBM traffic is what kills the naive approach for
    k-sized tables); level 2 extracts the sub-row with an in-register
    one-hot multiply-sum (int32 x 0/1, exact).  Bit-exact f32.

    MEASURED NEGATIVE RESULT on v5e (tested option): eval 1675 vs 1723
    imgs/s against the plain k-row gather — the level-1 s32 block-fetch
    output alone outweighs the gather latency.  docs/PERF.md."""
    m, p = table.shape
    k = idx.shape[0]
    mb = -(-m // block)
    pad = mb * block - m
    tb = jnp.pad(table, ((0, pad), (0, 0))) if pad else table
    tb_bits = jax.lax.bitcast_convert_type(
        tb.astype(jnp.float32), jnp.int32
    ).reshape(mb, block * p)
    hi = idx // block
    lo = idx % block
    rows = mxu_row_lookup(tb_bits, hi).reshape(k, block, p)
    onehot = (lo[:, None] == jnp.arange(block, dtype=idx.dtype)[None, :]).astype(
        jnp.int32
    )[..., None]
    out_bits = jnp.sum(rows * onehot, axis=1)  # (k, p) exact
    return jax.lax.bitcast_convert_type(out_bits, jnp.float32).astype(table.dtype)


def _gather_box_rows(sel_boxes: jax.Array, row: jax.Array, box_gather: str) -> jax.Array:
    """Candidate-boxes k-row fetch with the selected implementation:
    'xla'/'auto' = plain gather; 'mxu' = two-level one-hot lookup (XLA
    level, measured negative); 'pallas' = in-VMEM byte-plane kernel
    (lookup_kernel.py), falling back to the gather on backends the kernel
    cannot serve."""
    if box_gather == "mxu":
        return mxu_narrow_lookup(sel_boxes, row)
    if box_gather == "pallas":
        from yolort_tpu.ops.pallas.lookup_kernel import (
            pallas_fetch_mode,
            pallas_row_fetch,
        )

        mode = pallas_fetch_mode()
        if mode is not None:
            return pallas_row_fetch(
                sel_boxes, row, interpret=mode == "interpret"
            )[:, :4]
    return sel_boxes[row]


def select_topk_threshold(
    flat: jax.Array, k: int, score_thresh: float, sort: bool = True, w: int = 128,
    payload: Optional[jax.Array] = None, row_gather: str = "auto",
) -> Tuple[jax.Array, ...]:
    """Exact top-k selection of scores > score_thresh, without a large sort.

    Replaces ``lax.top_k`` over the (candidates x classes) score matrix — the
    dominant cost of the exact eval config (a 328k-element TopK is ~15 ms on
    v5e at batch 32; this runs in ~1 ms).  Three phases, all scatter-free
    (XLA scatter serializes per update on TPU):

      1. bisection for the exact k-th largest value t (31 masked counts);
      2. gather-formulated stream compaction of the >t entries followed by
         the ==t ties (two index-ordered tiers, so a strictly-greater entry
         is never displaced by a tie): chunk counts -> exclusive offsets ->
         per-slot chunk lookup (compare+reduce) -> 128-wide row gather ->
         in-lane rank extraction;
      3. a small descending sort of the k survivors (skippable when order
         does not matter, e.g. anchor pre-selection).

    flat: (n,) f32 or bf16 scores in [0, 1].  Returns (values, indices) with
    empty slots valued -1.0 — the same contract as masked ``lax.top_k``.
    For f32 input, matches ``lax.top_k`` output up to tie ORDER (ties resolve
    in index order within the boundary value; the selected SET and all values
    are identical).  For bf16 input the search runs on int16 bits (4 passes
    instead of 9, half the count bandwidth) and the threshold is rounded DOWN
    one ulp so boundary candidates are over- rather than under-selected —
    callers re-apply the exact threshold after rescoring.

    payload: optional (n // w, P) per-CHUNK side table (requires n % w == 0,
    same dtype family as flat).  Its rows ride the selection's internal chunk
    gather — lanes [w:w+P] of the same latency-bound row fetch, which is
    width-insensitive (~21 ns/row regardless) — so each selected slot also
    returns payload[idx // w] at zero extra gathers.  Callers lay the flat
    domain out so chunk == semantic row (e.g. one anchor per chunk) and put
    that row's expensive-to-regather data (decoded boxes) in the payload.
    Returns (values, indices, payload_rows) instead of (values, indices).
    A/B NOTE (v5e, eval config): carrying boxes this way measured SLOWER
    than the separate k-row gather it deletes (1666.7 vs 1723.3 imgs/s) —
    the narrow w the chunk==anchor layout forces (w=nc=80 instead of 128)
    grows the chunk count ~1.6x and with it every per-chunk counting pass.
    Off by default (payload_boxes in batched_postprocess_from_heads).
    """
    n = flat.shape[0]
    k = min(k, n)
    # w: stream-compaction chunk width.  128 suits ~300k domains; larger (512/
    # 1024) shrinks the per-slot chunk lookup (k x 2n/w compare-reduce) for
    # multi-million-entry domains at the cost of wider (cheap, latency-bound
    # anyway) row gathers and a wider in-lane rank extraction.
    pad = (-n) % w
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    npad = flat.shape[0]
    nc_chunks = npad // w
    if payload is not None:
        if pad:
            raise ValueError("payload requires flat.size to be a multiple of w")
        if payload.shape[0] != nc_chunks:
            raise ValueError(
                f"payload rows {payload.shape[0]} != chunks {nc_chunks} (w={w})"
            )

    pallas_full = False
    static_thr_bits = None
    if (
        row_gather in ("pallas_full", "pallas_select", "pallas_bisect")
        and flat.dtype != jnp.bfloat16
    ):
        # python-level threshold bits for the pallas kernels (score_thresh
        # is a static float; one computation shared by both kernel stages)
        import numpy as _np

        static_thr_bits = int(_np.float32(score_thresh).view(_np.int32))
    if (
        row_gather in ("pallas_full", "pallas_bisect")
        and flat.dtype != jnp.bfloat16
        and w == 128
    ):
        # fully in-VMEM bisect + chunk counts (lookup_kernel.py): the XLA
        # path re-streams the flat domain from HBM for every counting pass
        # (~5.1 ms) and again for the tier chunk counts (~3.3 ms); the
        # kernel holds the chunk table VMEM-resident and produces an
        # identical t (the bisection invariant has a unique fixed point).
        # Extraction then runs through the pallas_select path below.
        from yolort_tpu.ops.pallas.lookup_kernel import (
            pallas_bisect_count,
            pallas_fetch_mode,
        )

        _mode = pallas_fetch_mode()
        if _mode is not None:
            t, cg, ce = pallas_bisect_count(
                flat.reshape(nc_chunks, w), k, static_thr_bits,
                interpret=_mode == "interpret",
            )
            thr_bits = jnp.asarray(static_thr_bits, jnp.int32)
            cnt = jnp.concatenate([cg, ce])
            pallas_full = True
        # 'pallas_full' chains into the in-kernel extraction; 'pallas_bisect'
        # is the measured-best hybrid on v5e: in-VMEM bisect+counts (saves
        # the ~3.6 ms XLA counting streams) + plain pallas row fetch with
        # the XLA extraction tail (the in-kernel extract tail measured
        # SLOWER than the XLA tail: 52.9 vs 47.7 ms e2e postprocess)
        row_gather = "pallas_select" if row_gather == "pallas_full" else "pallas"

    if pallas_full:
        pass
    elif flat.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(flat, jnp.int16)
        thr_bits = (
            jax.lax.bitcast_convert_type(
                jnp.asarray(score_thresh, jnp.bfloat16), jnp.int16
            )
            - 1
        )
        valid = bits > thr_bits
        t = _bisect_kth_bits(bits, valid, k, passes=5)
    else:
        bits = jax.lax.bitcast_convert_type(flat.astype(jnp.float32), jnp.int32)
        thr_bits = jax.lax.bitcast_convert_type(
            jnp.asarray(score_thresh, jnp.float32), jnp.int32
        )
        valid = bits > thr_bits
        t = _bisect_kth_bits(bits, valid, k)

    if not pallas_full:
        sel_gt = valid & (bits >= t + 1)  # strictly above the boundary: < k
        sel_eq = valid & (bits == t)      # boundary ties fill remaining slots
        gt_c = sel_gt.reshape(nc_chunks, w)
        eq_c = sel_eq.reshape(nc_chunks, w)
        # virtual concatenation [gt entries, eq entries], both in index order
        cnt = jnp.concatenate(
            [jnp.sum(gt_c, axis=1, dtype=jnp.int32),
             jnp.sum(eq_c, axis=1, dtype=jnp.int32)]
        )  # (2*NC,)
    off = jnp.cumsum(cnt) - cnt
    total = off[-1] + cnt[-1]

    s_iota = jnp.arange(k, dtype=jnp.int32)
    # chunk containing output slot s: the last chunk whose offset <= s.
    m = off.shape[0]
    if m * k >= 1 << 22:
        # merge-by-sort, O((m+k)log(m+k)): ONE stable sort merges the chunk
        # offsets with the slot ids (chunk entries tie-break BEFORE slots at
        # equal value via the 2x+flag key), a running cummax of started-chunk
        # ids answers every slot, and a second small sort compacts the slot
        # answers back into s order.  At k=4096, m=5126, batch 128 this
        # replaces a 21M-compare/image reduce (~3 ms) with two ~9k sorts.
        # (A log2(m)-round vectorized binary search was also tried: 3x
        # SLOWER than even the compare-reduce — random element gathers are
        # latency-bound on TPU.)
        keys = jnp.concatenate([off * 2, s_iota * 2 + 1])
        cid = jnp.concatenate(
            [jnp.arange(m, dtype=jnp.int32), jnp.full((k,), -1, jnp.int32)]
        )
        offv = jnp.concatenate([off, jnp.zeros((k,), off.dtype)])
        skeys, scid, soff = jax.lax.sort((keys, cid, offv), dimension=0, num_keys=1)
        started = scid >= 0
        cmax = jax.lax.cummax(jnp.where(started, scid, -1))
        omax = jax.lax.cummax(jnp.where(started, soff, 0))
        # slots keep their relative (ascending) key order; chunks pushed last
        slot_rank = jnp.where(scid < 0, skeys, jnp.int32(2**30))
        _, c_all, o_all = jax.lax.sort(
            (slot_rank, cmax, omax), dimension=0, num_keys=1
        )
        c_of_s = jnp.clip(c_all[:k], 0, 2 * nc_chunks - 1)
        p = s_iota - o_all[:k]  # within-chunk rank
    else:
        # (k, m) compare-reduce: streams on the VPU, best for small domains
        c_of_s = jnp.sum((off[None, :] <= s_iota[:, None]).astype(jnp.int32), axis=1) - 1
        c_of_s = jnp.clip(c_of_s, 0, 2 * nc_chunks - 1)
        p = s_iota - off[c_of_s]  # within-chunk rank
    phys = c_of_s % nc_chunks
    is_eq_tier = c_of_s >= nc_chunks

    # ONE row gather; the tier masks are recomputed from the gathered values
    # (row gathers are the latency-bound cost at k=4096, so halving them
    # matters more than the recompute)
    if row_gather == "auto":
        # A/B on v5e (eval config, batch 128): the one-hot MXU lookup is
        # SLOWER than XLA's gather even at small chunk counts (1595 vs 1723
        # imgs/s with s1=197 / s2=2565 chunks) — the k x m one-hot bytes,
        # the 4x byte-plane s32 output traffic, and the plane prep outgrow
        # the ~13 ns/row gather latency they replace.  Kept as a tested
        # option (row_gather='mxu'), default XLA.
        row_gather = "xla"
    if payload is not None:
        # pad the table minor dim to a 128-lane multiple: a (m, w+P) table
        # with w+P not lane-aligned makes BOTH the concat and every op on
        # the gathered rows pay relayouts (measured ~9 ms at w=128, P=4,
        # batch 128 — more than the gather the payload removes); the padded
        # layout keeps rows[:, :w] a tile-aligned slice and the row fetch
        # stays latency-bound (width-insensitive)
        P = payload.shape[1]
        tw = -(-(w + P) // 128) * 128
        parts = [flat.reshape(nc_chunks, w), payload.astype(flat.dtype)]
        if tw > w + P:
            parts.append(jnp.zeros((nc_chunks, tw - w - P), flat.dtype))
        table = jnp.concatenate(parts, axis=1)
        rows = table[phys]  # (k, TW) — payload lanes ride the same fetch
        rows_v = rows[:, :w]
        pay = rows[:, w:w + P]
    elif row_gather == "mxu":
        rows_b = mxu_row_lookup(bits.reshape(nc_chunks, w), phys)
        rows_v = jax.lax.bitcast_convert_type(rows_b, flat.dtype if flat.dtype == jnp.bfloat16 else jnp.float32)
    elif (
        row_gather in ("pallas", "pallas_select")
        and flat.dtype != jnp.bfloat16
        and w <= 128
    ):
        # in-VMEM byte-plane one-hot MXU fetch (lookup_kernel.py): same
        # exact math as 'mxu' but zero HBM one-hot/plane traffic, band
        # skipping over the nondecreasing slot->chunk mapping.
        # 'pallas_select' additionally runs the tier recompute + in-lane
        # rank extraction INSIDE the kernel — the (k, w) rows never touch
        # HBM and the XLA-side tail below is skipped entirely.  Falls back
        # to the XLA gather on backends the kernel cannot serve (mode None).
        from yolort_tpu.ops.pallas.lookup_kernel import (
            pallas_fetch_mode,
            pallas_row_fetch,
            pallas_select_extract,
        )

        mode = pallas_fetch_mode()
        if mode is None:
            rows_v = flat.reshape(nc_chunks, w)[phys]
        elif row_gather == "pallas_select" and w == 128 and static_thr_bits is not None:
            vals, lane = pallas_select_extract(
                flat.reshape(nc_chunks, w), phys, p, is_eq_tier, t,
                thr_bits=static_thr_bits, interpret=mode == "interpret",
            )
            idx = phys * w + lane
            ok = s_iota < jnp.minimum(total, k)
            vals = jnp.where(ok, vals, -1.0)
            idx = jnp.where(ok, idx, 0)
            if sort:
                neg, idx = jax.lax.sort_key_val(-vals, idx)
                vals = -neg
            return vals, idx
        else:
            rows_v = pallas_row_fetch(
                flat.reshape(nc_chunks, w), phys, interpret=mode == "interpret"
            )[:, :w]
    else:
        rows_v = flat.reshape(nc_chunks, w)[phys]  # (k, W) row gather
    if row_gather != "mxu" or payload is not None:
        if flat.dtype == jnp.bfloat16:
            rows_b = jax.lax.bitcast_convert_type(rows_v, jnp.int16)
        else:
            rows_b = jax.lax.bitcast_convert_type(rows_v.astype(jnp.float32), jnp.int32)
    rows_valid = rows_b > thr_bits
    rows_m = rows_valid & jnp.where(
        is_eq_tier[:, None], rows_b == t, rows_b >= t + 1
    )
    # in-lane rank via cumsum-as-matmul: (k, w) 0/1 mask against an upper-
    # triangular 0/1 matrix on the MXU, f32-accumulated (products are 0/1
    # and row sums <= w, so this is exact).  ~2x cheaper than the log-round
    # lane cumsum the VPU would run at k=4096.
    tri = (
        jnp.arange(w, dtype=jnp.int32)[:, None] <= jnp.arange(w, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    incl = jax.lax.dot_general(
        rows_m.astype(jnp.bfloat16), tri,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rank_lane = incl.astype(jnp.int32) - 1
    hit = rows_m & (rank_lane == p[:, None])
    vals = jnp.sum(jnp.where(hit, rows_v, 0.0), axis=1)
    lane = jnp.sum(jnp.where(hit, jnp.arange(w, dtype=jnp.int32)[None, :], 0), axis=1)
    idx = phys * w + lane

    ok = s_iota < jnp.minimum(total, k)
    vals = jnp.where(ok, vals, -1.0)
    idx = jnp.where(ok, idx, 0)
    if payload is not None:
        if sort:
            cols = [pay[:, j] for j in range(pay.shape[1])]
            srt = jax.lax.sort((-vals, idx, *cols), dimension=0, num_keys=1)
            vals = -srt[0]
            idx = srt[1]
            pay = jnp.stack(srt[2:], axis=1)
        return vals, idx, pay
    if sort:
        neg, idx = jax.lax.sort_key_val(-vals, idx)
        vals = -neg
    return vals, idx


class Detections(NamedTuple):
    """Padded, fixed-shape detection results (per image or batched)."""

    boxes: jax.Array  # (..., D, 4) xyxy
    scores: jax.Array  # (..., D)
    labels: jax.Array  # (..., D) int32
    valid: jax.Array  # (..., D) bool
    num: jax.Array  # (...,) int32


def _single_image_nms(
    pred: jax.Array,
    *,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "topk",  # 'topk' | 'sort' (libtpu TopK-emitter workaround)
) -> Detections:
    """pred: (Na, 5+nc) decoded [cx,cy,w,h,obj,cls...] for ONE image.

    Candidate selection is two-stage to keep top_k off the full (Na*nc)
    score matrix (a 25200*80=2M-element sort dominates the whole pipeline on
    TPU): first the top ``pre_nms_anchors`` anchors by best-class score,
    then the top ``pre_nms_topk`` (anchor, class) pairs among those.  Exact
    whenever every surviving pair's anchor ranks within pre_nms_anchors by
    max score — guaranteed when pre_nms_anchors >= pre_nms_topk since each
    anchor contributes >= 1 pair at least as large as any of its pairs.
    """
    boxes_all = cxcywh_to_xyxy(pred[:, :4])
    scores_all = pred[:, 5:] * pred[:, 4:5]  # obj * cls (box_head.py:357)

    na = pred.shape[0]
    k = min(pre_nms_topk, na * num_classes)
    # k1 >= k makes the two-stage selection exact (see docstring).  The +8
    # sidesteps a libtpu TopK-emitter crash on the exact shape
    # (1, nc*k) with k=4096 (TransformWindow check failure in fusion_util).
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    def select_topk(values, kk, thresh=None):
        if topk_impl == "bisect":
            # bisection + gather compaction: no TopK emitter at all (also
            # sidesteps the libtpu batch-1 aborts), ~12x faster at k=4096
            return select_topk_threshold(values, kk, 0.0 if thresh is None else thresh)
        if topk_impl == "sort":
            # sort-based selection: the libtpu TopK emitter miscompiles some
            # batch-1 fused shapes (fusion_util.cc TransformWindow /
            # pipeline_emitter.cc span_size aborts); full argsort uses the
            # (solid) sort emitter instead.
            order = jnp.argsort(-values)
            idx = order[:kk]
            return values[idx], idx
        return jax.lax.top_k(values, kk)

    # stage 1: best-class score per anchor, top-k1 anchors
    per_anchor = jnp.max(scores_all, axis=-1)
    s1_vals, anchor_sel = select_topk(per_anchor, k1)  # (k1,)
    sel_scores = scores_all[anchor_sel]  # (k1, nc)
    if topk_impl == "bisect":
        # zero out slots beyond the valid-anchor count so a repeated index-0
        # gather can never fabricate duplicate candidates
        sel_scores = jnp.where(s1_vals[:, None] >= 0.0, sel_scores, 0.0)

    # stage 2: top-k (anchor, class) pairs among selected anchors
    flat = sel_scores.reshape(-1)
    if topk_impl == "bisect":
        top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes),
                                          thresh=score_thresh)
    else:
        flat = jnp.where(flat > score_thresh, flat, -1.0)
        top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes))
    anchor_idx = anchor_sel[top_idx // num_classes]
    labels = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = boxes_all[anchor_idx]
    valid = top_scores > score_thresh

    # class offset — torchvision _batched_nms_coordinate_trick semantics
    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (labels.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]

    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size,
                         impl=nms_impl, stop_after=detections_per_img)

    out_boxes, out_scores, out_labels, out_valid, num = _compact_detections(
        keep, cand_boxes, top_scores, labels, detections_per_img
    )
    return Detections(out_boxes, out_scores, out_labels, out_valid, num)


def _compact_detections(keep, cand_boxes, top_scores, labels, d):
    """Compact kept candidates (already score-ordered) into d padded slots.

    Scatter-free: XLA TPU scatter serializes per update (~5 ms at k=4096,
    batch 128), while the (k, d) one-hot compare-reduce streams on the VPU
    (~1 ms) and is bit-exact (each output slot receives exactly one term)."""
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    hit = keep[:, None] & (rank[:, None] == jnp.arange(d, dtype=jnp.int32)[None, :])
    out_boxes = jnp.sum(
        jnp.where(hit[:, :, None], cand_boxes[:, None, :], 0.0), axis=0
    ).astype(cand_boxes.dtype)
    out_scores = jnp.sum(jnp.where(hit, top_scores[:, None], 0.0), axis=0).astype(
        top_scores.dtype
    )
    out_labels = jnp.sum(jnp.where(hit, labels[:, None], 0), axis=0).astype(jnp.int32)
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), d)
    out_valid = jnp.arange(d) < num
    return out_boxes, out_scores, out_labels, out_valid, num


def _single_image_nms_from_logits(
    logits: jax.Array,
    grid: jax.Array,
    shift: jax.Array,
    stride: jax.Array,
    *,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int],
    nms_tile_size: int,
    nms_impl: str,
    topk_impl: str,
    classes_per_anchor: Optional[int] = None,
    anchor_props: Optional[tuple] = None,
    payload_boxes: bool = False,
    row_gather: str = "auto",
    box_gather: str = "auto",
) -> Detections:
    """Lazy-decode postprocess for ONE image.

    Two independently-toggled TPU gather eliminations (both bit-compatible
    with the defaults, A/B-measured in docs/PERF.md):

      * anchor_props = (grid_sizes, strides, anchor_grids): compute each
        selected anchor's grid/shift/stride by integer arithmetic on the
        flat index (head.anchor_props_from_index) instead of three k1-row
        table gathers.
      * payload_boxes (bisect only): stage 2 lays its flat score domain out
        one-anchor-per-chunk (w = nc) and rides the decoded boxes through
        select_topk_threshold's own chunk gather as payload lanes, deleting
        the separate cand-boxes k-row gather.

    logits: (Na, 5+nc) raw head logits in model dtype (e.g. bf16); grid /
    shift: (Na, 2); stride: (Na,).  Candidate *selection* runs on the cheap
    low-precision scores; boxes and exact f32 scores are computed only for
    the <= k1 selected anchors — the (Na, 4) fp32 box materialization the
    eager path pays (reference decodes everything up front,
    box_head.py:328-348) never happens.

    (See also ``_single_image_nms_single_stage`` — the full-domain variant
    that became the fast TPU path once the bisect counting passes fused;
    this two-stage path remains the CPU / lax.top_k reference.)
    """
    na = logits.shape[0]
    k = min(pre_nms_topk, na * num_classes)
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    def select_topk(values, kk, thresh=None, sort=True):
        if topk_impl == "bisect":
            return select_topk_threshold(values, kk, 0.0 if thresh is None else thresh,
                                         sort=sort, row_gather=row_gather)
        if topk_impl == "sort":
            order = jnp.argsort(-values)
            idx = order[:kk]
            return values[idx], idx
        return jax.lax.top_k(values, kk)

    # stage 1 on model-dtype scores (selection only; exact scores recomputed
    # in f32 on the selected subset below).  Order of the selected anchors is
    # irrelevant (stage 2 re-sorts pairs), so the bisect path skips its sort.
    # Max over RAW class logits first: sigmoid is monotone, so
    # max_c sig(obj)*sig(cls_c) == sig(obj)*sig(max_c cls_c) — one
    # transcendental per anchor instead of nc (the full-domain sigmoid was
    # ~5 ms of the stage at batch 128).
    obj = jax.nn.sigmoid(logits[:, 4])
    per_anchor = jax.nn.sigmoid(jnp.max(logits[:, 5:], axis=-1)) * obj
    s1_vals, anchor_sel = select_topk(per_anchor.astype(jnp.float32), k1, sort=False)

    sel_logits = logits[anchor_sel].astype(jnp.float32)  # (k1, 5+nc)
    sel_sig = jax.nn.sigmoid(sel_logits)
    sel_scores = sel_sig[:, 5:] * sel_sig[:, 4:5]  # (k1, nc) f32
    if topk_impl == "bisect":
        # invalidate slots past the valid-anchor count (repeated index-0
        # gathers must not fabricate duplicate candidates)
        sel_scores = jnp.where(s1_vals[:, None] >= 0.0, sel_scores, 0.0)

    # decode boxes for selected anchors only (reference decode math,
    # _utils.py:43)
    if anchor_props is not None:
        from yolort_tpu.models.head import anchor_props_from_index

        g, s, st = anchor_props_from_index(anchor_sel, *anchor_props)
        st = st[:, None]
    else:
        g = grid[anchor_sel]
        s = shift[anchor_sel]
        st = stride[anchor_sel][:, None]
    xy = (sel_sig[:, 0:2] * 2.0 - 0.5 + g) * st
    wh = (sel_sig[:, 2:4] * 2.0) ** 2 * s
    sel_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))  # (k1, 4)

    # stage 2: top-k (anchor, class) pairs.  classes_per_anchor restricts
    # each anchor to its best C classes first, shrinking the sort domain
    # nc/C-fold (multi-label anchors rarely carry >2-3 above-threshold
    # classes in practice; None = exact multi-label semantics).
    if classes_per_anchor is not None and classes_per_anchor < num_classes:
        cpa = classes_per_anchor
        class_vals, class_idx = jax.lax.top_k(sel_scores, cpa)  # (k1, cpa)
        flat = class_vals.reshape(-1)
        if topk_impl == "bisect":
            top_scores, top_idx = select_topk(flat, min(k, k1 * cpa), thresh=score_thresh)
        else:
            flat = jnp.where(flat > score_thresh, flat, -1.0)
            top_scores, top_idx = select_topk(flat, min(k, k1 * cpa))
        row = top_idx // cpa
        labels = class_idx.reshape(-1)[top_idx].astype(jnp.int32)
    elif payload_boxes and topk_impl == "bisect":
        flat = sel_scores.reshape(-1)
        top_scores, top_idx, cand_boxes = select_topk_threshold(
            flat, min(k, k1 * num_classes), score_thresh,
            w=num_classes, payload=sel_boxes,
        )
        labels = (top_idx % num_classes).astype(jnp.int32)
        row = None
    else:
        flat = sel_scores.reshape(-1)
        if topk_impl == "bisect":
            top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes),
                                              thresh=score_thresh)
        else:
            flat = jnp.where(flat > score_thresh, flat, -1.0)
            top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes))
        row = top_idx // num_classes
        labels = (top_idx % num_classes).astype(jnp.int32)
    if row is not None:
        if box_gather == "auto":
            # A/B on v5e: the two-level one-hot lookup measured SLOWER than
            # the k-row gather it replaces (eval 1675 vs 1723 imgs/s) — the
            # level-1 block fetch's s32 output traffic exceeds the gather
            # latency.  Tested option, default XLA.
            box_gather = "xla"
        cand_boxes = _gather_box_rows(sel_boxes, row, box_gather)
    valid = top_scores > score_thresh

    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (labels.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]
    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size,
                         impl=nms_impl, stop_after=detections_per_img)

    out_boxes, out_scores, out_labels, out_valid, num = _compact_detections(
        keep, cand_boxes, top_scores, labels, detections_per_img
    )
    return Detections(out_boxes, out_scores, out_labels, out_valid, num)


def _single_image_nms_padded(
    logits: jax.Array,
    *,
    num_classes: int,
    grid_sizes,
    strides,
    anchor_grids,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int],
    nms_tile_size: int,
    nms_impl: str,
    payload_boxes: bool = False,
    s1_impl: str = "auto",
    stage2: str = "auto",
    row_gather: str = "auto",
    box_gather: str = "auto",
) -> Detections:
    """Lane-padded lazy-decode postprocess for ONE image.

    MEASURED NEGATIVE RESULT on v5e (kept as a tested option, like the
    Pallas qconv): eval 1580 vs 1723 imgs/s for the default path with
    arithmetic anchor props — the wider head convs, the not-actually-free
    padded flatten, and the w=nc payload selection cost more than the
    lane-aligned stage-1 saves.  See docs/PERF.md "Negative results".

    logits: (Na, kp) raw head logits with kp a 128-lane multiple >= 5+nc —
    produced by YOLOHead.padded_call, whose pad lanes are exactly PAD_LOGIT
    (models/head.py).  Functionally identical to
    ``_single_image_nms_from_logits`` (reference semantics:
    yolort/models/box_head.py:388-429); what changes is the TPU cost model:

      * the (B,H,W,A*kp) -> (Na, kp) flatten upstream stays lane-aligned
        (the 85-wide minor dim pays a lane-crossing relayout instead);
      * stage-1 obj/class-max run as full-lane masked reductions — no
        lane-slice relayouts on the (Na, kp) stream;
      * grid/shift/stride come from index arithmetic
        (head.anchor_props_from_index) instead of three k-row table gathers;
      * stage-2 lays its flat score domain out one-anchor-per-chunk (w = nc)
        and rides the decoded boxes through the selection's own chunk gather
        as payload lanes — the separate cand-boxes k-row gather disappears.
    """
    from yolort_tpu.models.head import anchor_props_from_index

    na, kp = logits.shape
    nc = num_classes
    k = min(pre_nms_topk, na * nc)
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    # stage 1 on model-dtype scores: masked full-lane reductions (lane iota
    # compares are free on the VPU; slicing lanes 4 / 5:5+nc would relayout)
    lane = jnp.arange(kp, dtype=jnp.int32)
    cls_mask = (lane >= 5) & (lane < 5 + nc)
    neg = jnp.asarray(-1.0e4, logits.dtype)
    obj_logit = jnp.max(jnp.where(lane == 4, logits, neg), axis=-1)
    cls_logit = jnp.max(jnp.where(cls_mask, logits, neg), axis=-1)
    # sigmoid is monotone: max_c sig(obj)*sig(cls_c) == sig(obj)*sig(max_c)
    per_anchor = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)
    if s1_impl == "auto":
        s1_impl = "sortidx"
    if s1_impl == "sortidx":
        # indices-only screen: one single-operand i32 sort replaces the
        # whole stream-compaction (incl. its latency-bound k1-row gather)
        s1_ok, anchor_sel = select_topk_indices(per_anchor.astype(jnp.float32), k1)
    else:
        s1_vals, anchor_sel = select_topk_threshold(
            per_anchor.astype(jnp.float32), k1, 0.0, sort=False
        )
        s1_ok = s1_vals >= 0.0

    sel_logits = logits[anchor_sel].astype(jnp.float32)  # (k1, kp) THE row gather
    sel_sig = jax.nn.sigmoid(sel_logits)
    return _decode_stage2_nms(
        sel_sig, anchor_sel, s1_ok, lane, cls_mask,
        num_classes=num_classes, grid_sizes=grid_sizes, strides=strides,
        anchor_grids=anchor_grids, score_thresh=score_thresh,
        nms_thresh=nms_thresh, detections_per_img=detections_per_img,
        k=k, k1=k1, nms_tile_size=nms_tile_size, nms_impl=nms_impl,
        payload_boxes=payload_boxes, stage2=stage2,
        row_gather=row_gather, box_gather=box_gather,
    )


def _decode_stage2_nms(
    sel_sig, anchor_sel, s1_ok, lane, cls_mask, *,
    num_classes, grid_sizes, strides, anchor_grids, score_thresh,
    nms_thresh, detections_per_img, k, k1, nms_tile_size, nms_impl,
    payload_boxes, stage2, row_gather="auto", box_gather="auto",
) -> Detections:
    """Shared tail of the lane-padded postprocess paths: lazy box decode for
    the k1 stage-1 survivors (arithmetic anchor properties), stage-2
    (anchor, class) pair selection, NMS, compaction.  sel_sig: (k1, kp) f32
    sigmoid of the selected rows (pad lanes ~0)."""
    from yolort_tpu.models.head import anchor_props_from_index

    nc = num_classes
    kp = sel_sig.shape[1]

    # decode boxes for the k1 selected anchors; anchor properties from index
    # arithmetic (bit-identical to the anchor_tables constants)
    g, s, st = anchor_props_from_index(anchor_sel, grid_sizes, strides, anchor_grids)
    xy = (sel_sig[:, 0:2] * 2.0 - 0.5 + g) * st[:, None]
    wh = (sel_sig[:, 2:4] * 2.0) ** 2 * s
    sel_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))  # (k1, 4)

    if stage2 == "auto":
        # A/B on v5e (batch 128, eval config, postprocess-only): flat80
        # beats row128 BOTH with the unaligned payload table (45.5 vs
        # 50.2 ms — the 132-lane minor dim relayouts outweighed the
        # deleted cand-boxes gather) and after lane-aligning the table to
        # a 128-multiple (cell-major stage-1: 75.2 vs 82.8 ms on a denser
        # synthetic load) — the payload-widened chunk rows inflate the
        # stage-2 counting stream more than the one k-row box gather they
        # remove
        stage2 = "flat80"
    if stage2 == "row128":
        # stage 2, chunk == anchor at FULL lane width: the (k1, kp) score
        # rows keep their 128-lane layout (invalid lanes — box/obj/pad —
        # masked to 0.0, below any positive threshold), so the selection's
        # chunk == one anchor row and the decoded boxes ride its internal
        # chunk gather as payload lanes: the separate cand-boxes k-row
        # gather disappears WITHOUT the w=nc narrow-chunk counting growth
        # that sank the earlier payload layout (chunks stay lane-aligned;
        # the counting stream grows kp/nc = 1.6x but every per-chunk op
        # stays 128-wide).  Bit-identical detections to the flat80 path:
        # the per-(anchor,class) scores, threshold semantics, tie order
        # (chunk == anchor preserves index order) and box values all match.
        obj_col = jnp.max(jnp.where(lane == 4, sel_sig, 0.0), axis=-1, keepdims=True)
        score_rows = jnp.where(
            cls_mask[None, :] & s1_ok[:, None], sel_sig * obj_col, 0.0
        )  # (k1, kp) f32
        top_scores, top_idx, cand_boxes = select_topk_threshold(
            score_rows.reshape(-1), min(k, k1 * nc), score_thresh,
            w=kp, payload=sel_boxes,
        )
        labels = (top_idx % kp - 5).astype(jnp.int32)
        valid = top_scores > score_thresh
        labels = jnp.where(valid, labels, 0)  # empty slots carry idx 0
    else:
        sel_scores = sel_sig[:, 5:5 + nc] * sel_sig[:, 4:5]  # (k1, nc) f32
        # invalidate slots past the valid-anchor count (repeated index-0
        # gathers must not fabricate duplicate candidates)
        sel_scores = jnp.where(s1_ok[:, None], sel_scores, 0.0)

        # payload_boxes rides the boxes through the selection's chunk gather
        # with w=nc (measured slower — the narrow chunks grow the counting
        # passes; kept as an option); default is the plain select + one
        # k-row box gather, as in the unpadded path.
        flat = sel_scores.reshape(-1)
        if payload_boxes:
            top_scores, top_idx, cand_boxes = select_topk_threshold(
                flat, min(k, k1 * nc), score_thresh, w=nc, payload=sel_boxes
            )
            labels = (top_idx % nc).astype(jnp.int32)
        else:
            top_scores, top_idx = select_topk_threshold(
                flat, min(k, k1 * nc), score_thresh, row_gather=row_gather
            )
            labels = (top_idx % nc).astype(jnp.int32)
            cand_boxes = _gather_box_rows(sel_boxes, top_idx // nc, box_gather)
        valid = top_scores > score_thresh

    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (labels.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]
    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size,
                         impl=nms_impl, stop_after=detections_per_img)

    out_boxes, out_scores, out_labels, out_valid, num = _compact_detections(
        keep, cand_boxes, top_scores, labels, detections_per_img
    )
    return Detections(out_boxes, out_scores, out_labels, out_valid, num)


def _single_image_nms_cells(
    cells: jax.Array,
    *,
    num_classes: int,
    num_anchors: int,
    grid_sizes,
    strides,
    anchor_grids,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int],
    nms_tile_size: int,
    nms_impl: str,
    payload_boxes: bool = False,
    stage2: str = "auto",
    row_gather: str = "auto",
    box_gather: str = "auto",
    cell_gather: str = "auto",
) -> Detections:
    """Cell-major lazy-decode postprocess for ONE image.

    cells: (n_cells, A*(5+nc)) raw head logits in CONV channel layout — the
    per-level (H, W, A*kw) outputs reshaped to (H*W, A*kw) and concatenated
    over levels.  Unlike ``flatten_heads``'s (Na, kw) layout, this concat
    never changes the minor dimension, so it costs a plain copy instead of
    a lane-crossing relayout (measured on v5e at batch 128: 2.1 ms vs
    4.7 ms for flatten+pad, and the segmented stage-1 reductions fuse with
    it — full stage-1 6.7 ms vs 12.1 ms).  Stage 1 reduces each anchor's
    [85a+5, 85a+85) class segment and 85a+4 obj lane in place; only the k1
    selected anchors' cell rows are gathered (one latency-bound k-row
    fetch) and their 85-lane segment extracted + lane-padded, after which
    the pipeline is the shared `_decode_stage2_nms` tail — detections are
    bit-identical to the padded/default paths (same reference semantics,
    yolort/models/box_head.py:388-429)."""
    from yolort_tpu.models.head import PAD_LOGIT, padded_num_outputs

    A = num_anchors
    nc = num_classes
    kw = 5 + nc
    n_cells = cells.shape[0]
    na = n_cells * A
    k = min(pre_nms_topk, na * nc)
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    # stage 1: per-anchor best-class score via segmented full-lane masked
    # reductions on the A*kw conv rows (sigmoid is monotone, one
    # transcendental pair per anchor)
    clane = jnp.arange(A * kw, dtype=jnp.int32)
    neg = jnp.asarray(-1.0e4, cells.dtype)
    per = []
    for a in range(A):
        base = a * kw
        obj_l = jnp.max(jnp.where(clane == base + 4, cells, neg), axis=-1)
        cls_l = jnp.max(
            jnp.where((clane >= base + 5) & (clane < base + kw), cells, neg), axis=-1
        )
        per.append(jax.nn.sigmoid(cls_l) * jax.nn.sigmoid(obj_l))
    # (n_cells, A) -> (Na,) in flatten_heads anchor order (cell-major, anchor
    # minor: global anchor index = cell*A + a)
    per_anchor = jnp.stack(per, axis=-1).reshape(-1)

    s1_ok, anchor_sel = select_topk_indices(per_anchor.astype(jnp.float32), k1)

    cell_sel = anchor_sel // A
    if cell_gather == "pallas":
        # band-skipped in-VMEM byte-plane fetch: anchor_sel is piecewise
        # index-sorted (two tiers from the sort compaction), so each
        # 512-slot block touches a narrow row band of the (n_cells, A*kw)
        # table; bf16 tables use 2 byte planes.  Falls back to the XLA
        # gather where the kernel can't serve the backend.
        from yolort_tpu.ops.pallas.lookup_kernel import (
            pallas_fetch_mode,
            pallas_row_fetch,
        )

        _mode = pallas_fetch_mode()
        if _mode is None:
            crows = cells[cell_sel]
        else:
            crows = pallas_row_fetch(
                cells, cell_sel, interpret=_mode == "interpret"
            )[:, : A * kw]
    else:
        crows = cells[cell_sel]  # (k1, A*kw) THE row gather
    a_sel = anchor_sel % A
    # extract the selected anchor's kw-lane segment (3-way select on small
    # (k1, kw) slices), then lane-pad to the padded-head layout
    segs = [crows[:, a * kw:(a + 1) * kw] for a in range(A)]
    sel = segs[-1]
    for a in range(A - 2, -1, -1):
        sel = jnp.where((a_sel == a)[:, None], segs[a], sel)
    kp = padded_num_outputs(kw)
    if kp != kw:
        sel = jnp.concatenate(
            [sel, jnp.full((k1, kp - kw), PAD_LOGIT, sel.dtype)], axis=1
        )
    sel_sig = jax.nn.sigmoid(sel.astype(jnp.float32))

    lane = jnp.arange(kp, dtype=jnp.int32)
    cls_mask = (lane >= 5) & (lane < 5 + nc)
    return _decode_stage2_nms(
        sel_sig, anchor_sel, s1_ok, lane, cls_mask,
        num_classes=num_classes, grid_sizes=grid_sizes, strides=strides,
        anchor_grids=anchor_grids, score_thresh=score_thresh,
        nms_thresh=nms_thresh, detections_per_img=detections_per_img,
        k=k, k1=k1, nms_tile_size=nms_tile_size, nms_impl=nms_impl,
        payload_boxes=payload_boxes, stage2=stage2,
        row_gather=row_gather, box_gather=box_gather,
    )


def _single_image_nms_single_stage(
    logits: jax.Array,
    grid: jax.Array,
    shift: jax.Array,
    stride: jax.Array,
    *,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    nms_tile_size: int,
    nms_impl: str,
) -> Detections:
    """Single-stage full-domain lazy-decode postprocess for ONE image.

    ONE bisect-select over all (Na*nc) bf16 scores replaces the two-stage
    anchor-screen + pair-select, cutting the number of latency-bound k-row
    gathers from four to two.  Measured on v5e at batch 128 it LOSES to the
    two-stage path anyway (119 vs 70 ms eval config): the full-domain
    bisect counting (17 ms over 2M bf16 entries) and the slot->chunk
    lookup/extract (which scale with domain/chunk width) outgrow the two
    gathers removed.  Kept as a tested option (docs/PERF.md "Negative
    results") — its cost model favors small pre_nms_topk over very large
    anchor domains.

    Selection runs on bf16 keys (threshold rounded one ulp down =>
    over-selects); the kept candidates are re-scored in exact f32 from the
    gathered logits rows and re-sorted, so final detections match the
    reference's f32 semantics whenever the above-threshold count fits in
    pre_nms_topk (reference keeps ALL survivors, box_head.py:388-410; the
    k-cap is this fixed-shape design's only approximation, as before).
    """
    na = logits.shape[0]
    nc = num_classes
    k = min(pre_nms_topk, na * nc)

    lg16 = logits.astype(jnp.bfloat16)
    obj = jax.nn.sigmoid(lg16[:, 4:5])
    scores = (jax.nn.sigmoid(lg16[:, 5:]) * obj).reshape(-1)  # (Na*nc,) bf16
    v_sel, idx = select_topk_threshold(scores, k, score_thresh, sort=False, w=1024)

    anchor = idx // nc
    label = (idx % nc).astype(jnp.int32)
    sel_ok = v_sel >= 0.0  # empty slots are -1 (repeated idx-0 must not fabricate)

    rows = logits[anchor].astype(jnp.float32)  # (k, 5+nc) — THE row gather
    sig = jax.nn.sigmoid(rows)
    cls_onehot = label[:, None] == jnp.arange(nc, dtype=jnp.int32)[None, :]
    score = sig[:, 4] * jnp.sum(jnp.where(cls_onehot, sig[:, 5:], 0.0), axis=1)
    valid = sel_ok & (score > score_thresh)  # exact f32 threshold re-applied
    score = jnp.where(valid, score, -1.0)

    # exact-f32 descending order (NMS consumes score-ordered candidates);
    # one multi-operand sort — payload gathers after a sort would cost
    # another latency-bound k-row gather
    neg, anchor, label, sx, sy, sw, sh, ok8 = jax.lax.sort(
        (-score, anchor, label, sig[:, 0], sig[:, 1], sig[:, 2], sig[:, 3],
         valid.astype(jnp.int32)),
        dimension=0, num_keys=1,
    )
    score = -neg
    valid = ok8 > 0

    g = grid[anchor]
    s = shift[anchor]
    st = stride[anchor][:, None]
    xy = (jnp.stack([sx, sy], axis=-1) * 2.0 - 0.5 + g) * st
    wh = (jnp.stack([sw, sh], axis=-1) * 2.0) ** 2 * s
    cand_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))  # (k, 4)

    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (label.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]
    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size,
                         impl=nms_impl, stop_after=detections_per_img)

    out_boxes, out_scores, out_labels, out_valid, num = _compact_detections(
        keep, cand_boxes, score, label, detections_per_img
    )
    return Detections(out_boxes, out_scores, out_labels, out_valid, num)


def batched_postprocess_from_heads(
    head_outputs,
    strides,
    anchor_grids,
    *,
    num_classes: int,
    score_thresh: float = 0.005,
    nms_thresh: float = 0.45,
    detections_per_img: int = 300,
    pre_nms_topk: int = 4096,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "auto",
    classes_per_anchor: Optional[int] = None,
    selection: str = "auto",
    anchor_arith="auto",
    payload_boxes="auto",
    row_gather: str = "auto",
    box_gather: str = "auto",
    flatten_pad="auto",
    s1_impl: str = "auto",
    stage2: str = "auto",
    cell_gather: str = "auto",
) -> Detections:
    """Lazy-decode batched postprocess from raw per-level head logits.

    selection: 'two_stage' (default/auto) = anchor-screen then pair-select;
    'single' = full-domain single-stage select
    (`_single_image_nms_single_stage`) — measured SLOWER on v5e at batch
    128 (119 vs 70 ms eval config, 46 vs 14 ms serving: the full-domain
    bisect counting + slot->chunk lookup outgrow the gathers they remove;
    docs/PERF.md "Negative results"), kept as a tested option because its
    cost model favors very small pre_nms_topk on very large anchor counts.
    """
    from yolort_tpu.models.head import anchor_tables, flatten_heads

    num_anchors = len(anchor_grids[0]) // 2
    grid_sizes = [o.shape[1:3] for o in head_outputs]

    if topk_impl == "auto":
        # bisect-select on TPU: ~12x faster than the TopK emitter at k=4096
        # and immune to its batch-1 fused-shape aborts
        topk_impl = "bisect" if jax.default_backend() not in ("cpu",) else "topk"
    if selection == "auto":
        selection = "two_stage"
    on_tpu = jax.default_backend() not in ("cpu",)
    if anchor_arith == "auto":
        # pure VPU index arithmetic beats three k1-row table gathers on TPU;
        # on CPU the gathers are cheaper than the per-level where-chains
        anchor_arith = on_tpu
    if payload_boxes == "auto":
        # A/B on v5e: payload-carried boxes measured slower (1666.7 vs
        # 1723.3 imgs/s eval) — the w=nc chunk layout grows the counting
        # passes.  Tested option, default off.
        payload_boxes = False
    if flatten_pad == "auto":
        # A/B on v5e: the cell-major path keeps the head outputs in conv
        # channel layout (concat 2.1 ms vs flatten+pad 4.7 ms; segmented
        # stage-1 6.7 vs 12.1 ms) — best for eval-style large-k selects;
        # the small-k serving config stays on the unpadded default (-43
        # imgs/s measured for the padded variants there)
        flatten_pad = (
            "cell" if on_tpu and topk_impl == "bisect" and pre_nms_topk >= 2048
            else False
        )

    if flatten_pad == "cell":
        if os.environ.get("YOLORT_PALLAS_FETCH") == "1":
            # measurement hook: route all three latency-bound fetches of the
            # cell path through the in-VMEM byte-plane kernels
            # (ops/pallas/lookup_kernel.py) without touching call sites
            if row_gather == "auto":
                row_gather = "pallas_full"
            if box_gather == "auto":
                box_gather = "pallas"
            if cell_gather == "auto":
                cell_gather = "pallas"
        elif os.environ.get("YOLORT_PALLAS_FETCH") == "0":
            # force-off hook (bench A/B): pin every fetch to the XLA path
            if row_gather == "auto":
                row_gather = "xla"
        elif row_gather == "auto" and jax.default_backend() in ("tpu", "axon"):
            # gate on an actual TPU backend, not not-CPU: on GPU/ROCm the
            # kernels can't compile and correctness would hinge on the
            # pallas_fetch_mode()->None fallback (advisor r3)
            # v5e hardware A/B (tools/experiments/ab_lookup.py, eval config,
            # batch 128, all paths bit-identical): postprocess 41.7 ms with
            # the hybrid (in-VMEM 4-ary bisect + chunk counts, pallas row
            # fetch, XLA extraction tail) vs 48.7 XLA / 45.3 pallas fetch
            # alone / 47.0 pallas_full / 49.6 pallas_select; the box (w=4:
            # one-hot matmul work dwarfs the 3-5 ms gather) and cells
            # (byte-plane table exceeds the 16 MB scoped-VMEM limit) kernel
            # fetches lose and stay XLA.
            row_gather = "pallas_bisect"

    if flatten_pad == "cell" and selection == "two_stage" and classes_per_anchor is None:
        cells = jnp.concatenate(
            [o.reshape(o.shape[0], gs[0] * gs[1], o.shape[3]) for o, gs in
             zip(head_outputs, grid_sizes)], axis=1,
        )  # (B, n_cells, A*kw) — minor dim unchanged: copy, not relayout
        fnc = partial(
            _single_image_nms_cells,
            num_classes=num_classes,
            num_anchors=num_anchors,
            grid_sizes=tuple(tuple(g) for g in grid_sizes),
            strides=tuple(strides),
            anchor_grids=tuple(tuple(a) for a in anchor_grids),
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            detections_per_img=detections_per_img,
            pre_nms_topk=pre_nms_topk,
            pre_nms_anchors=pre_nms_anchors,
            nms_tile_size=nms_tile_size,
            nms_impl=nms_impl,
            payload_boxes=payload_boxes,
            stage2=stage2,
            row_gather=row_gather,
            box_gather=box_gather,
            cell_gather=cell_gather,
        )
        return jax.vmap(fnc)(cells)

    logits = flatten_heads(head_outputs, num_anchors)  # (B, Na, K)

    if flatten_pad and selection == "two_stage" and classes_per_anchor is None:
        # pad the flattened logits to a 128-lane minor dim AFTER the
        # standard-width head convs (PAD_LOGIT lanes can never score above
        # threshold), then run the lane-aligned masked-stage-1 path: the
        # padded-head idea without its wider-conv cost.  A/B'd on v5e.
        from yolort_tpu.models.head import PAD_LOGIT, padded_num_outputs

        kw = num_classes + 5
        kp = padded_num_outputs(kw)
        if kp != kw:
            logits = jnp.pad(
                logits, ((0, 0), (0, 0), (0, kp - kw)),
                constant_values=jnp.asarray(PAD_LOGIT, logits.dtype),
            )
        fnp = partial(
            _single_image_nms_padded,
            num_classes=num_classes,
            grid_sizes=tuple(tuple(g) for g in grid_sizes),
            strides=tuple(strides),
            anchor_grids=tuple(tuple(a) for a in anchor_grids),
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            detections_per_img=detections_per_img,
            pre_nms_topk=pre_nms_topk,
            pre_nms_anchors=pre_nms_anchors,
            nms_tile_size=nms_tile_size,
            nms_impl=nms_impl,
            payload_boxes=payload_boxes,
            s1_impl=s1_impl,
            stage2=stage2,
            row_gather=row_gather,
            box_gather=box_gather,
        )
        return jax.vmap(fnp)(logits)

    grid, shift, stride = anchor_tables(grid_sizes, strides, anchor_grids)

    if selection == "single":
        fn1 = partial(
            _single_image_nms_single_stage,
            num_classes=num_classes,
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            detections_per_img=detections_per_img,
            pre_nms_topk=pre_nms_topk,
            nms_tile_size=nms_tile_size,
            nms_impl=nms_impl,
        )
        return jax.vmap(fn1, in_axes=(0, None, None, None))(logits, grid, shift, stride)

    fn = partial(
        _single_image_nms_from_logits,
        num_classes=num_classes,
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        topk_impl=topk_impl,
        classes_per_anchor=classes_per_anchor,
        anchor_props=(
            (tuple(grid_sizes), tuple(strides), tuple(tuple(a) for a in anchor_grids))
            if anchor_arith else None
        ),
        payload_boxes=payload_boxes,
        row_gather=row_gather,
        box_gather=box_gather,
    )
    return jax.vmap(fn, in_axes=(0, None, None, None))(logits, grid, shift, stride)


def batched_postprocess_from_padded_heads(
    head_outputs,
    strides,
    anchor_grids,
    *,
    num_classes: int,
    score_thresh: float = 0.005,
    nms_thresh: float = 0.45,
    detections_per_img: int = 300,
    pre_nms_topk: int = 4096,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    payload_boxes: bool = False,
    s1_impl: str = "auto",
    stage2: str = "auto",
) -> Detections:
    """Batched postprocess from lane-padded head logits (YOLOHead.padded_call).

    Masked stage-1 reductions, arithmetic anchor properties, payload-carried
    boxes — see ``_single_image_nms_padded`` (measured negative result on
    v5e; off by default, forced via YOLO(head_pad=True)).  Requires the
    bisect selection machinery (select_topk_threshold)."""
    from yolort_tpu.models.head import flatten_heads

    num_anchors = len(anchor_grids[0]) // 2
    grid_sizes = tuple(o.shape[1:3] for o in head_outputs)
    logits = flatten_heads(head_outputs, num_anchors)  # (B, Na, kp) lane-aligned

    fn = partial(
        _single_image_nms_padded,
        num_classes=num_classes,
        grid_sizes=grid_sizes,
        strides=tuple(strides),
        anchor_grids=tuple(tuple(a) for a in anchor_grids),
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        payload_boxes=payload_boxes,
        s1_impl=s1_impl,
        stage2=stage2,
    )
    return jax.vmap(fn)(logits)


def batched_postprocess(
    pred_logits: jax.Array,
    *,
    num_classes: int,
    score_thresh: float = 0.005,
    nms_thresh: float = 0.45,
    detections_per_img: int = 300,
    pre_nms_topk: int = 4096,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "auto",
) -> Detections:
    """Batched in-graph NMS postprocess.

    pred_logits: (B, Na, 5+nc) decoded predictions (from
    models.head.concat_pred_logits). Returns batched padded Detections.

    Equivalent of the reference PostProcess.forward per-image loop
    (box_head.py:388-429), fully vectorized via vmap.

    topk_impl='auto' uses bisection-select on TPU (fast, no TopK emitter —
    which aborts on some batch-1 fused shapes) and lax.top_k on CPU.
    """
    if topk_impl == "auto":
        topk_impl = "bisect" if jax.default_backend() not in ("cpu",) else "topk"
    fn = partial(
        _single_image_nms,
        num_classes=num_classes,
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        topk_impl=topk_impl,
    )
    return jax.vmap(fn)(pred_logits)
