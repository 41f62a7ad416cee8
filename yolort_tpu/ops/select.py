"""Exact top-k candidate selection without large sorts — the TPU-side
machinery behind the in-graph NMS (ops/nms.py).

The reference's candidate selection is ``torch.where(scores > thresh)``
(yolort/models/box_head.py:418) — shape-dynamic and impossible inside one
XLA program.  The fixed-shape replacement here avoids ``lax.top_k`` (whose
TopK emitter costs ~15 ms on a 328k domain at batch 32 on v5e and aborts on
some batch-1 fused shapes) with branchless bisection on float bit patterns
plus scatter-free stream compaction.

Production entry points:
  * ``select_topk_threshold`` — values+indices top-k over a threshold
    (the stage-2 pair select);
  * ``select_topk_indices`` — indices-only screen (the stage-1 anchor
    screen: one small int32 sort replaces the whole compaction);
  * ``_bisect_kth_bits`` — the shared exact k-th-value search.

Measured-negative variants (MXU one-hot lookups) live in
``ops/select_experimental.py``; the in-VMEM Pallas fetch/bisect kernels in
``ops/pallas/lookup_kernel.py``.  Every A/B number cited below is from v5e
hardware runs recorded in docs/PERF.md.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


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


def select_topk_indices_compact(
    flat: jax.Array, k: int, score_thresh: float = 0.0
) -> Tuple[jax.Array, jax.Array]:
    """Indices-only exact top-k via the stream-compaction machinery — the
    small-k1 alternative to ``select_topk_indices``'s whole-domain sort.

    The sort formulation won its stage-1 A/B at the EVAL config (k1=4104,
    where the compaction's k-row chunk gather costs ~6 ms at batch 128 and
    the 25k single-operand i32 sort ~2.6 ms).  The gather is latency-bound
    in ROW COUNT, so at the serving config (k1=520) it costs ~8x less while
    the sort still pays its full domain-sized price — the crossover this
    variant exists for.  v5e e2e A/B (tools/experiments/s1select.py,
    batch 128 @640): serving compact 3913.9 vs sortidx 3744.8 imgs/s
    (-1.48 ms/step); eval sortidx 2213.3 vs compact 1962.1 — the resolved
    default picks by k1 (resolve_nms_config).  Same (ok, idx) contract and the same index-ordered
    gt-then-eq tie order as ``select_topk_indices`` (the compaction fills
    slots from the virtual [gt tiers, eq tiers] concatenation, both in
    index order), so downstream programs are bit-identical.
    """
    vals, idx = select_topk_threshold(
        flat.astype(jnp.float32), k, score_thresh, sort=False
    )
    # occupied slots carry a real score (> score_thresh >= 0); empties -1.0
    return vals > jnp.asarray(score_thresh, vals.dtype), idx


def _gather_box_rows(sel_boxes: jax.Array, row: jax.Array, box_gather: str) -> jax.Array:
    """Candidate-boxes k-row fetch with the selected implementation:
    'xla'/'auto' = plain gather; 'mxu' = two-level one-hot lookup (XLA
    level, measured negative — ops/select_experimental.py); 'pallas' =
    in-VMEM byte-plane kernel (lookup_kernel.py), falling back to the
    gather on backends the kernel cannot serve."""
    if box_gather == "mxu":
        from yolort_tpu.ops.select_experimental import mxu_narrow_lookup

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
    lookup_fetch = False
    _mode = None
    static_thr_bits = None
    if (
        row_gather in ("pallas_full", "pallas_select", "pallas_bisect",
                       "pallas_lookup")
        and flat.dtype != jnp.bfloat16
    ):
        # python-level threshold bits for the pallas kernels (score_thresh
        # is a static float; one computation shared by both kernel stages)
        import numpy as _np

        static_thr_bits = int(_np.float32(score_thresh).view(_np.int32))
    if (
        row_gather in ("pallas_full", "pallas_bisect", "pallas_lookup")
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
            # 'pallas_lookup' replaces the XLA merge-by-sort slot->chunk
            # lookup AND the chunk-row fetch with the fused in-VMEM kernel
            # (band-skipped counting over the monotone offsets table)
            lookup_fetch = row_gather == "pallas_lookup"
        # 'pallas_full' chains into the in-kernel extraction; 'pallas_bisect'
        # is the measured-best hybrid on v5e: in-VMEM bisect+counts (saves
        # the ~3.6 ms XLA counting streams) + plain pallas row fetch with
        # the XLA extraction tail (the in-kernel extract tail measured
        # SLOWER than the XLA tail: 52.9 vs 47.7 ms e2e postprocess)
        if row_gather == "pallas_full":
            row_gather = "pallas_select"
        elif row_gather == "pallas_lookup":
            row_gather = "xla"  # only reached when the kernel is unavailable
        else:
            row_gather = "pallas"

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
    if lookup_fetch:
        from yolort_tpu.ops.pallas.lookup_kernel import pallas_lookup_fetch

        rows_v, phys, p, is_eq_tier = pallas_lookup_fetch(
            flat.reshape(nc_chunks, w), off.astype(jnp.int32), k,
            interpret=_mode == "interpret",
        )
        rows_b = jax.lax.bitcast_convert_type(rows_v, jnp.int32)
        return _extract_tail(
            rows_v, rows_b, phys, p, is_eq_tier, t, thr_bits,
            s_iota, total, k, w, sort,
        )
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
        # option (row_gather='mxu', select_experimental.py), default XLA.
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
        from yolort_tpu.ops.select_experimental import mxu_row_lookup

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
    return _extract_tail(
        rows_v, rows_b, phys, p, is_eq_tier, t, thr_bits, s_iota, total,
        k, w, sort, pay=pay if payload is not None else None,
    )


def _extract_tail(rows_v, rows_b, phys, p, is_eq_tier, t, thr_bits,
                  s_iota, total, k, w, sort, pay=None):
    """Shared XLA extraction tail of ``select_topk_threshold``: recompute
    the gt/eq tier masks on the fetched chunk rows, extract each slot's
    p-th set lane via the tri-matmul rank, mask empty slots, and optionally
    sort descending (payload columns ride the sort)."""
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
    if pay is not None:
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
