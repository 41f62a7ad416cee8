"""MEASURED-NEGATIVE selection variants, kept importable for re-measurement.

Both functions below are bit-exact replacements for XLA's latency-bound
k-row gather that LOST their hardware A/B on v5e (numbers + analysis in
docs/PERF.md "Negative results"); the winning in-VMEM formulation of the
same byte-plane one-hot idea lives in ops/pallas/lookup_kernel.py.  They
are reachable from production code only via explicit option values
(row_gather='mxu' / box_gather='mxu') and re-exported by
tools/experiments/neg_options.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
