"""Pallas TPU kernel: bit-exact k-row table lookup as in-VMEM one-hot MXU
matmuls.

Why: XLA's TPU gather is latency-bound at ~13-21 ns/row *regardless of row
width or table size* (measured, docs/PERF.md) — at the exact-eval config the
two k=4096-row gathers (stage-2 chunk rows + candidate boxes) cost ~11 ms of
the 63 ms step at batch 128.  The XLA-level one-hot matmul replacement
(`ops.nms.mxu_row_lookup`) measured SLOWER because it materializes the
(k, m) one-hot and the 4x byte planes in HBM (~2.7 GB of traffic per batch).
This kernel runs the same exact byte-plane math with everything VMEM
resident: one-hot tiles are generated in registers per (slot-block,
row-block) pair, planes are prepped once per image, and nothing but the
(m, 128) table and the (k,) indices ever crosses HBM.

Exactness: the table's f32 bit patterns are split into four s8 byte planes
(offset -128); 0/1 x s8 products accumulate exactly in s32; each output row
receives exactly one 1 across all row-blocks, so the +128 offset correction
is the constant 128 per plane, and int32 wrap-around reassembles the
original bits modulo 2^32 — bit-exact for arbitrary f32 (incl. the
INT_MIN/INT_MAX sign corners pinned by tests/test_mxu_lookup.py for the XLA
variant; this kernel reuses that contract).

Band skipping: per 512-slot block the kernel reduces the block's index range
to [lo, hi] scalars and `@pl.when`-skips row-blocks outside it.  The
stage-2 selection's slot->chunk mapping is nondecreasing (two sorted tiers),
so its slot blocks touch a narrow row band and most of the (k/512 x m/128)
matmul grid never runs; unsorted indices (the box fetch) degrade gracefully
to the full grid, which is still MXU-bound rather than latency-bound.
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

_W = 128   # table row width (lanes)
_SB = 512  # slots per block
_RB = 128  # table rows per block


def pallas_fetch_mode() -> str | None:
    """How pallas_row_fetch can run on the current backend: 'compile' on TPU
    backends (incl. the axon relay), 'interpret' on CPU (slow but exact —
    how the tests run), None when unavailable (no pltpu module, or a GPU
    backend where the Mosaic kernel cannot lower) — callers fall back to
    the XLA gather."""
    if not _HAS_PLTPU:
        return None
    b = jax.default_backend()
    if b == "cpu":
        return "interpret"
    if b in ("gpu", "cuda", "rocm"):
        return None
    return "compile"


def byte_planes(bits: jax.Array, nbytes: int = 4) -> jax.Array:
    """Split (m, w) int bit patterns into the (m, nbytes*w) s8 byte-plane
    table (each byte offset by -128 into s8 range).  Shared exactness
    contract with the recombination `(plane + 128) << (8*i)` summed with
    int32 wrap — see ops.nms.mxu_row_lookup and _fetch_kernel.  nbytes=4
    for f32/i32 tables, 2 for bf16/i16 (half the matmul work)."""
    bits = bits.astype(jnp.int32)
    return jnp.concatenate(
        [(((bits >> (8 * i)) & 0xFF) - 128).astype(jnp.int8) for i in range(nbytes)],
        axis=1,
    )


def _fetch_kernel(phys_ref, planes_ref, out_ref, acc_ref, *, k: int, m: int,
                  nbytes: int = 4):
    """phys (k, 1) i32; planes (m, nbytes*_W) s8 (byte-plane table,
    row-major); out (k, _W) i32 row bit patterns (zero-extended for
    nbytes=2); acc scratch (_SB, nbytes*_W) i32."""
    nrb = m // _RB
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)

    for sb in range(k // _SB):
        phys = phys_ref[pl.ds(sb * _SB, _SB), :]  # (_SB, 1) i32
        out_ref[pl.ds(sb * _SB, _SB), :] = _fetch_block_bits(
            phys, planes_ref, acc_ref, nrb, iota_l, nbytes
        )


def _fetch_block_bits(phys, planes_ref, acc_ref, nrb, iota_l, nbytes=4):
    """Shared per-slot-block fetch: (_SB, 1) indices -> (_SB, _W) i32 row
    bits via band-skipped byte-plane one-hot matmuls.  The row-block loop is
    a fori_loop (not unrolled python) so the kernel's code size stays flat
    as the table grows — iterating only the blocks inside the slot block's
    [lo, hi] index band skips the rest entirely."""
    lo = jnp.min(phys)
    hi = jnp.max(phys)
    acc_ref[:, :] = jnp.zeros((_SB, nbytes * _W), jnp.int32)

    def body(rb, _):
        onehot = (phys == iota_l + rb * _RB).astype(jnp.int8)  # (_SB, _W)
        blk = planes_ref[pl.ds(rb * _RB, _RB), :]  # (_RB, nbytes*_W) s8
        acc_ref[:, :] += jax.lax.dot_general(
            onehot, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return 0

    rb0 = jnp.clip(lo // _RB, 0, nrb - 1)
    rb1 = jnp.clip(hi // _RB + 1, 1, nrb)
    jax.lax.fori_loop(rb0, rb1, body, 0)

    bits = jnp.zeros((_SB, _W), jnp.int32)
    for i in range(nbytes):
        byte = acc_ref[:, i * _W:(i + 1) * _W] + 128  # undo the s8 offset
        bits = bits + (byte << (8 * i))  # wraps; bit pattern exact
    return bits


def _lookup_fetch_kernel(offplanes_ref, rowmax_ref, planes_ref, out_ref,
                         meta_ref, acc_ref, *, k: int, m: int, m2: int,
                         nc: int):
    """Slot->chunk lookup + band-skipped row fetch, fully in VMEM.

    Replaces the XLA-side merge-by-sort slot->chunk lookup (two ~9k sorts
    per image, ~4.9 ms at the eval config) AND the chunk-row gather.  For
    each output slot s the containing chunk is the last offset <= s over
    the monotone ``off`` table; because off is globally nondecreasing, an
    off row whose max is <= s contributes all 128 entries, and exactly ONE
    row (the "boundary row" br = number of full rows) can contribute
    partially.  The count is therefore one dense compare against the
    per-row maxima plus a compare against each slot's own boundary row —
    fetched with the same in-register one-hot machinery as the table rows
    (the off table is a single row-block).  Two slower designs are
    recorded in docs/PERF.md: a fori over off rows with dynamic sublane
    slices (88 ms) and a statically-unrolled pl.when visit loop (41 scalar
    branch regions: ~21 ms — Mosaic pays ~0.5 us per region even when the
    predicate skips).

    offplanes (_RB, 4*_W) s8: byte planes of the off table rows (off
    reshaped (m2p//_W, _W), padded with 2^30 rows up to _RB).
    rowmax (1, _W) i32: per-off-row maxima (lanes past the row count are
    2^30).  planes (m, 4*_W) s8: byte-plane table of the nc PHYSICAL chunk
    rows.  out (k, _W) i32: fetched row bit patterns.  meta (k, _W) i32:
    lane 0 = phys (physical chunk row), lane 1 = p (within-chunk rank),
    lane 2 = is_eq tier flag — the XLA extraction tail's inputs."""
    nrb = m // _RB
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    rowmax = rowmax_ref[:, :]  # (1, _W); lanes >= n_off_rows are 2^30

    for sb in range(k // _SB):
        s = sb * _SB + jax.lax.broadcasted_iota(jnp.int32, (_SB, 1), 0)
        full = rowmax <= s  # (_SB, _W): row fully at-or-below slot s
        # boundary row per slot = #full rows; every full row contributes
        # all 128 entries and their largest offset is the largest full-row
        # max (rowmax includes the 2^30 pads, so a padded row is never full
        # and br always points at a fetchable row)
        br = jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True)
        omax_full = jnp.max(jnp.where(full, rowmax, 0), axis=1, keepdims=True)
        brow = _fetch_block_bits(br, offplanes_ref, acc_ref, 1, iota_l, 4)
        le = brow <= s  # (_SB, _W): boundary-row entries at-or-below s
        cnt = br * _W + jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True)
        omax = jnp.maximum(
            omax_full, jnp.max(jnp.where(le, brow, 0), axis=1, keepdims=True)
        )
        c = jnp.clip(cnt - 1, 0, m2 - 1)
        is_eq = (c >= nc).astype(jnp.int32)
        phys = c - is_eq * nc
        p = s - omax
        meta_ref[pl.ds(sb * _SB, _SB), :] = jnp.where(
            iota_l == 0, phys, jnp.where(iota_l == 1, p, jnp.where(iota_l == 2, is_eq, 0))
        )
        out_ref[pl.ds(sb * _SB, _SB), :] = _fetch_block_bits(
            phys, planes_ref, acc_ref, nrb, iota_l, 4
        )


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_lookup_fetch(flat_rows: jax.Array, off: jax.Array, k: int,
                        interpret: bool = False):
    """In-VMEM slot->chunk lookup + chunk-row fetch for the stage-2
    selection: given the (nc, 128) f32 chunk table and the (2*nc,) i32
    exclusive tier offsets, return for each of k output slots the fetched
    chunk row plus (phys, p, is_eq) — bit-identical to the XLA
    merge-by-sort lookup + row gather it replaces (the lookup invariant
    ``last chunk with off <= s`` is computed exactly by counting).

    Returns (rows (k, 128) f32, phys (k,) i32, p (k,) i32, is_eq (k,) bool).
    """
    if not _HAS_PLTPU:
        raise RuntimeError("pallas_lookup_fetch requires pallas.tpu")
    nc, w = flat_rows.shape
    if w != _W:
        raise ValueError(f"lookup_fetch requires w == {_W}")
    m2 = off.shape[0]
    if m2 != 2 * nc:
        raise ValueError(f"off rows {m2} != 2*chunks {2 * nc}")
    kp = -(-k // _SB) * _SB
    mp = -(-nc // _RB) * _RB
    m2p = -(-m2 // _W) * _W
    if m2p // _W > _W:
        raise ValueError(f"off table too large ({m2p // _W} rows > {_W})")
    tab = flat_rows.astype(jnp.float32)
    if mp > nc:
        tab = jnp.pad(tab, ((0, mp - nc), (0, 0)))
    planes = byte_planes(jax.lax.bitcast_convert_type(tab, jnp.int32))
    if m2p == m2:
        # force at least one padded off entry so the last row is never
        # "full" and br always addresses a real row
        m2p += _W
    offp = jnp.concatenate(
        [off.astype(jnp.int32), jnp.full((m2p - m2,), jnp.int32(2**30))]
    )
    offp = offp.reshape(m2p // _W, _W)
    # per-off-row maxima (the "full row" staircase the kernel counts
    # against); lanes past the row count sit above every slot id
    rowmax = jnp.full((1, _W), jnp.int32(2**30))
    rowmax = jax.lax.dynamic_update_slice(
        rowmax, jnp.max(offp, axis=1)[None, :], (0, 0)
    )
    # byte planes of the off rows themselves (padded to one row-block):
    # the kernel fetches each slot's boundary row with the same one-hot
    # machinery as the chunk rows
    off_tab = jnp.concatenate(
        [offp, jnp.full((_RB - m2p // _W, _W), jnp.int32(2**30))]
    )
    offplanes = byte_planes(off_tab)

    vspec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec()
    )
    bits, meta = pl.pallas_call(
        functools.partial(_lookup_fetch_kernel, k=kp, m=mp, m2=m2, nc=nc),
        out_shape=[
            jax.ShapeDtypeStruct((kp, _W), jnp.int32),
            jax.ShapeDtypeStruct((kp, _W), jnp.int32),
        ],
        in_specs=[vspec, vspec, vspec],
        out_specs=[vspec, vspec],
        scratch_shapes=[pltpu.VMEM((_SB, 4 * _W), jnp.int32)],
        interpret=interpret,
    )(offplanes, rowmax, planes)
    rows = jax.lax.bitcast_convert_type(bits[:k], jnp.float32)
    return rows, meta[:k, 0], meta[:k, 1], meta[:k, 2].astype(jnp.bool_)


def _select_kernel(meta_ref, planes_ref, t_ref, out_ref, acc_ref,
                   *, k: int, m: int, thr_bits: int):
    """In-kernel tail of select_topk_threshold's extraction: fetch each
    slot's chunk-row bits (byte-plane matmuls), recompute the gt/eq tier
    masks against the bisected k-th value t, extract the slot's in-lane rank
    hit, and emit (value, lane) — the (k, _W) rows never touch HBM and the
    XLA-side tier/rank machinery disappears.

    meta (k, 8) i32: col 0 = phys (chunk row), col 1 = p (within-chunk
    rank), col 2 = is_eq tier flag.  t (1, 1) i32 in SMEM: the k-th value's
    f32 bits.  out (k, _W) f32: col 0 = value, col 1 = lane."""
    nrb = m // _RB
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 1)
    ).astype(jnp.bfloat16)  # inclusive-cumsum-as-matmul (counts <= 128: exact)
    t = t_ref[0, 0]

    iota_8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    for sb in range(k // _SB):
        blk = meta_ref[pl.ds(sb * _SB, _SB), :]  # (_SB, 8) i32
        # field extraction by masked lane-reduce (single-lane slices at
        # offsets 1/2 are relayout-hostile in Mosaic; a reduce is not)
        phys = jnp.sum(jnp.where(iota_8 == 0, blk, 0), axis=1, keepdims=True)
        p = jnp.sum(jnp.where(iota_8 == 1, blk, 0), axis=1, keepdims=True)
        is_eq = jnp.sum(jnp.where(iota_8 == 2, blk, 0), axis=1, keepdims=True)
        bits = _fetch_block_bits(phys, planes_ref, acc_ref, nrb, iota_l)
        rows_v = jax.lax.bitcast_convert_type(bits, jnp.float32)
        rows_valid = bits > thr_bits
        # tier select in i32 arithmetic: a select producing an i1 vector
        # lowers to an arith.trunci i8->i1 Mosaic rejects on hardware
        # (is_eq is 0/1 from the meta i32 column)
        tier = is_eq * (bits == t).astype(jnp.int32) + (1 - is_eq) * (
            bits >= t + 1
        ).astype(jnp.int32)
        rows_m = rows_valid & (tier > 0)
        incl = jax.lax.dot_general(
            rows_m.astype(jnp.bfloat16), tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = incl.astype(jnp.int32) - 1
        hit = rows_m & (rank == p)
        vals = jnp.sum(jnp.where(hit, rows_v, 0.0), axis=1, keepdims=True)
        lane = jnp.sum(
            jnp.where(hit, iota_l.astype(jnp.float32), 0.0), axis=1, keepdims=True
        )
        # full-row write: col 0 = value, col 1 = lane, rest zero
        out_ref[pl.ds(sb * _SB, _SB), :] = jnp.where(
            iota_l == 0, vals, jnp.where(iota_l == 1, lane, 0.0)
        )


def _bisect_count_kernel(bits_ref, t_ref, cnt_ref, *, k: int, thr_bits: int,
                         passes: int, arms: int):
    """Exact k-th-largest bisection + per-chunk gt/eq counts, all in VMEM.

    bits (m, _W) i32 score bit patterns (f32-monotone for the positive
    scores this selection runs on; pad entries are 0.0 bits and fail the
    threshold).  t (1, 1) i32 out: the converged k-th value bits (identical
    to ops.nms._bisect_kth_bits — the invariant count(>=lo) >= k >
    count(>=hi) has a unique fixed point, so the arity/pass count only
    affects speed, and arms**passes >= 2**31 guarantees convergence).
    cnt (m, _W) f32 out: col 0 = per-chunk count of bits >= t+1 (gt tier),
    col 1 = count of bits == t (eq tier), cols 2+ zero (the full-lane row
    write is the Mosaic-friendly shape); counts <= 128 are exact in f32.

    Why in-kernel: XLA's fused 15-accumulator counting stream re-reads the
    flat domain from HBM every pass (measured 5.1 ms at the eval config)
    and the gt/eq chunk counts pay another full stream (3.3 ms); here the
    table is VMEM-resident once and the count compute (arms-1 compares per
    pass) is the only cost."""
    bits = bits_ref[:, :]
    valid = bits > thr_bits
    masked = jnp.where(valid, bits, jnp.int32(-(2**31)))
    sentinel = jnp.int32(2**30)
    lo0 = jnp.min(jnp.where(valid, bits, sentinel))
    hi0 = jnp.int32(0x40000000)  # bits of f32 2.0 — above any score <= 1.0

    def body(_, state):
        lo, hi = state
        step = jnp.maximum((hi - lo) // arms, 1)
        m = jnp.int32(0)
        for i in range(1, arms):
            piv = jnp.minimum(lo + step * i, hi)
            c = jnp.sum((masked >= piv).astype(jnp.int32))
            m = m + (c >= k).astype(jnp.int32)
        new_lo = jnp.where(m > 0, lo + step * m, lo)
        new_hi = jnp.where(m < arms - 1, lo + step * (m + 1), hi)
        return new_lo, jnp.minimum(new_hi, hi)

    lo, _ = jax.lax.fori_loop(0, passes, body, (lo0, hi0))
    t_ref[0, 0] = lo
    gt = (valid & (bits >= lo + 1)).astype(jnp.float32)
    eq = (valid & (bits == lo)).astype(jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    cg = jnp.sum(gt, axis=1, keepdims=True)
    ce = jnp.sum(eq, axis=1, keepdims=True)
    cnt_ref[:, :] = jnp.where(iota_l == 0, cg, jnp.where(iota_l == 1, ce, 0.0))


@functools.partial(jax.jit, static_argnames=("k", "thr_bits", "interpret"))
def pallas_bisect_count(flat_rows: jax.Array, k: int, thr_bits: int,
                        interpret: bool = False):
    """Bisected k-th value + per-chunk tier counts for a (m, 128) f32 chunk
    table, VMEM-resident.  Returns (t () i32, cnt_gt (m,) i32,
    cnt_eq (m,) i32) bit-identical to the XLA _bisect_kth_bits + masked
    chunk-count path."""
    if not _HAS_PLTPU:
        raise RuntimeError("pallas_bisect_count requires pallas.tpu")
    m, w = flat_rows.shape
    if w != _W:
        raise ValueError(f"bisect_count requires w == {_W}")
    mp = -(-m // _RB) * _RB
    tab = flat_rows.astype(jnp.float32)
    if mp > m:
        tab = jnp.pad(tab, ((0, mp - m), (0, 0)))
    bits = jax.lax.bitcast_convert_type(tab, jnp.int32)

    vspec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec()
    )
    sspec = (
        pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret else pl.BlockSpec()
    )
    # arms=4 / passes=16: 4**16 = 2**32 covers the positive-f32 bit range;
    # 3 counts/pass = 48 total vs the 16-ary XLA stream's 135 — the count
    # compute, not memory, is the bisection's cost once VMEM-resident
    t, cnt = pl.pallas_call(
        functools.partial(_bisect_count_kernel, k=k, thr_bits=thr_bits,
                          passes=16, arms=4),
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((mp, _W), jnp.float32),
        ],
        in_specs=[vspec],
        out_specs=[sspec, vspec],
        interpret=interpret,
    )(bits)
    return t[0, 0], cnt[:m, 0].astype(jnp.int32), cnt[:m, 1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("thr_bits", "interpret"))
def pallas_select_extract(flat_rows: jax.Array, phys: jax.Array, p: jax.Array,
                          is_eq: jax.Array, t_bits: jax.Array, thr_bits: int,
                          interpret: bool = False):
    """In-kernel slot extraction for select_topk_threshold: for each output
    slot, fetch its chunk row (byte-plane matmuls in VMEM), recompute the
    tier mask against t, and extract the p-th set lane's (value, lane).

    flat_rows: (m, _W) f32 chunk table; phys/p/is_eq: (k,) slot metadata;
    t_bits: () i32 bisected k-th value bits; thr_bits: static threshold
    bits.  Returns (vals (k,) f32, lane (k,) i32) — identical to the
    XLA gather + tier recompute + tri-matmul rank extraction it replaces.
    """
    if not _HAS_PLTPU:
        raise RuntimeError("pallas_select_extract requires pallas.tpu")
    m, w = flat_rows.shape
    if w != _W:
        raise ValueError(f"select mode requires w == {_W}")
    k = phys.shape[0]
    mp = -(-m // _RB) * _RB
    kp = -(-k // _SB) * _SB
    tab = flat_rows.astype(jnp.float32)
    if mp > m:
        tab = jnp.pad(tab, ((0, mp - m), (0, 0)))
    planes = byte_planes(jax.lax.bitcast_convert_type(tab, jnp.int32))
    meta = jnp.zeros((kp, 8), jnp.int32)
    meta = meta.at[:k, 0].set(jnp.clip(phys.astype(jnp.int32), 0, m - 1))
    meta = meta.at[:k, 1].set(p.astype(jnp.int32))
    meta = meta.at[:k, 2].set(is_eq.astype(jnp.int32))
    t_in = t_bits.astype(jnp.int32).reshape(1, 1)

    vspec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec()
    )
    sspec = (
        pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret else pl.BlockSpec()
    )
    out = pl.pallas_call(
        functools.partial(_select_kernel, k=kp, m=mp, thr_bits=thr_bits),
        out_shape=jax.ShapeDtypeStruct((kp, _W), jnp.float32),
        in_specs=[vspec, vspec, sspec],
        out_specs=vspec,
        scratch_shapes=[pltpu.VMEM((_SB, 4 * _W), jnp.int32)],
        interpret=interpret,
    )(meta, planes, t_in)
    return out[:k, 0], out[:k, 1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_row_fetch(table: jax.Array, phys: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Bit-exact ``table[phys]`` for a (m, w) f32 or bf16 table and (k,) i32
    indices, as in-VMEM byte-plane one-hot MXU matmuls (2 planes for bf16,
    4 for f32).  Tables wider than 128 lanes are fetched in 128-lane column
    groups (each group band-skips independently).  Returns (k, W) in the
    table dtype where W = w rounded up to 128 (pad lanes zero); callers
    slice [:, :w].  k is padded to a 512 multiple and m to 128 internally.
    """
    if not _HAS_PLTPU:
        raise RuntimeError(
            "pallas_row_fetch requires jax.experimental.pallas.tpu "
            "(unavailable in this jaxlib) — use the XLA gather instead"
        )
    m, w = table.shape
    k = phys.shape[0]
    mp = -(-m // _RB) * _RB
    kp = -(-k // _SB) * _SB
    wp = -(-w // _W) * _W
    bf16 = table.dtype == jnp.bfloat16
    nbytes = 2 if bf16 else 4
    tab = table if bf16 else table.astype(jnp.float32)
    if wp > w or mp > m:
        tab = jnp.pad(tab, ((0, mp - m), (0, wp - w)))
    ibits = jax.lax.bitcast_convert_type(tab, jnp.int16 if bf16 else jnp.int32)
    ph = jnp.clip(phys.astype(jnp.int32), 0, m - 1)
    if kp > k:
        ph = jnp.concatenate([ph, jnp.zeros((kp - k,), jnp.int32)])
    ph = ph.reshape(kp, 1)

    vspec = (
        pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec()
    )
    cols = []
    for c in range(0, wp, _W):
        planes = byte_planes(ibits[:, c:c + _W], nbytes)  # (mp, nbytes*_W) s8
        out = pl.pallas_call(
            functools.partial(_fetch_kernel, k=kp, m=mp, nbytes=nbytes),
            out_shape=jax.ShapeDtypeStruct((kp, _W), jnp.int32),
            in_specs=[vspec, vspec],
            out_specs=vspec,
            scratch_shapes=[pltpu.VMEM((_SB, nbytes * _W), jnp.int32)],
            interpret=interpret,
        )(ph, planes)
        cols.append(out)
    bits_out = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    if bf16:
        rows = jax.lax.bitcast_convert_type(
            bits_out.astype(jnp.uint16).astype(jnp.int16), jnp.bfloat16
        )
    else:
        rows = jax.lax.bitcast_convert_type(bits_out, jnp.float32)
    return rows[:k]
