"""Pallas TPU fused-epilogue int8 convolution.

The XLA int8 conv path (ops/blocks.py:_conv_int8) computes s8 x s8 -> s32 on
the MXU, but XLA's TPU conv custom-call cannot absorb the
dequant -> bias -> SiLU -> requant epilogue: every quantized conv pays an
extra s32 (4 B/elem) HBM round-trip before the int8 (1 B/elem) activation is
written — measured as the 16.7-vs-11.5 ms backbone gap and the int8 P6
inversion (docs/PERF.md "int8 backbone").  These kernels keep the s32
accumulator in VMEM and write the requantized int8 activation directly, so a
quantized conv's HBM traffic is its floor: int8 in, int8 (or bf16) out.

Two kernels, both matmul-formulated for the MXU's native s8 path:

  * ``1x1 stride 1`` — the conv IS a matmul over (N*H*W, Cin); standard
    blocked pipeline, grid over row/output-channel tiles.
  * ``3x3 stride 1`` — manual-DMA row tiles with a 1-row/1-col halo into a
    zeroed VMEM scratch; the 9 taps become 9 accumulated matmuls over the
    width-padded flattening (out flat index i needs in flat index
    i + dy*(W+2) + dx — a constant row offset, so no per-tap gather).

Epilogue (in f32, strictly more accurate than the XLA path's bf16):
``y = s32 * (in_scale*w_scale)[co] + bias[co]; act(y); round(y/out_scale)``
with round-half-to-even, clipped to [-127, 127] — matching
blocks._requantize / blocks._conv_int8 semantics (the reference contract is
the ppq INT8 engine flow, /root/reference/deployment/ppq).

The pure-XLA path remains the fallback (CPU, unsupported shapes) and the
verification oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def available() -> bool:
    """OFF by default — a measured negative result (round 3).

    Hypothesis (from the round-2 model-level ceiling analysis): XLA's conv
    custom-call cannot absorb the int8 epilogue, so every quantized conv
    pays an s32 HBM round-trip that a fused Pallas conv would remove.
    Measurement (v5e, batch 128, chained timing) falsified it per-conv: the
    XLA int8 conv + its fused epilogue is already near traffic-optimal
    (e.g. 3x3 80x80x64: XLA 0.34 ms vs 1.36 ms for this kernel; 1x1
    20x20x512: 0.08 vs 0.29), and e2e the kernels took the int8 backbone
    from 16.3 ms (XLA) to 51 ms.  The losses are Mosaic-level: pad/concat/
    shift relayouts around the tap matmuls and per-grid-step overhead that
    the hand-tuned XLA conv emitter simply doesn't pay.  Kept (bit-exact,
    tested on hardware + in interpret mode) behind YOLORT_QCONV=1 as the
    documented experiment; see docs/PERF.md "fused int8 conv (negative)".
    """
    return (
        _HAS_PLTPU
        and jax.default_backend() not in ("cpu",)
        and os.environ.get("YOLORT_QCONV", "0") in ("1", "band")
    )


def shape_gated(k: int, h: int, w: int, cin: int, cout: int) -> bool:
    """True when this conv shape should use the fused kernel under the
    current YOLORT_QCONV mode.  ``band`` restricts the kernel to the
    measured winning band from the round-5 per-shape P6@1280 sweep
    (tools/experiments/qconv_shapes.py, v5e, batch 64): large-extent 1x1s
    with narrow channels — 160x160x{64,128}->{64..255} and 320x320x64->64
    win 0.06-0.63 ms/conv; every 3x3, every cin>=256 wide-channel 1x1, and
    the cout=32 stem-adjacent 1x1s lose (Mosaic relayout + per-grid-step
    overhead).  Mode "1" keeps the r3 everything-on experiment."""
    mode = os.environ.get("YOLORT_QCONV", "0")
    if mode == "1":
        return True
    return (
        mode == "band"
        and k == 1
        and h * w >= 160 * 160
        and 64 <= cin <= 128
        and cout >= 64
    )


def _act(y, name: str):
    if name == "silu":
        return y * jax.nn.sigmoid(y)
    if name == "hardswish":
        return y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    if name == "leaky_relu":
        return jnp.where(y >= 0, y, 0.1 * y)
    assert name == "none", name
    return y


def _epilogue(acc_s32, sc, b, inv_os, act: str, out_int8: bool, out_dtype):
    y = acc_s32.astype(jnp.float32) * sc + b
    y = _act(y, act)
    if out_int8:
        return jnp.clip(jnp.round(y * inv_os), -127.0, 127.0).astype(jnp.int8)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# 1x1 stride-1: a blocked matmul with the epilogue fused
# ---------------------------------------------------------------------------

def _kernel_1x1(x_ref, w_ref, sc_ref, b_ref, ios_ref, out_ref, *, act, out_int8):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = _epilogue(
        acc, sc_ref[:], b_ref[:], ios_ref[0], act, out_int8, out_ref.dtype
    )


def qconv1x1(xq, wq, scale, bias, *, act="silu", inv_out_scale=None,
             out_dtype=jnp.bfloat16, block_m: int = 1024, interpret=False):
    """xq: (M, C) int8 rows; wq: (C, Cout) int8; scale/bias: (Cout,) f32.

    Returns (M, Cout) int8 when ``inv_out_scale`` is given, else ``out_dtype``.
    """
    m, c = xq.shape
    cout = wq.shape[1]
    out_int8 = inv_out_scale is not None
    tn = cout if cout <= 512 else 512
    # tile M so the f32/s32 accumulator stays ~2 MB: small-channel convs get
    # much taller tiles (grid-step overhead dominated the first version —
    # 800 steps at tm=1024 for an 80x80x64 conv measured 4x slower than XLA)
    tm = max(block_m, (2 ** 21 // (4 * tn)) // 512 * 512)
    tm = min(tm, m)
    grid = (pl.cdiv(m, tm), pl.cdiv(cout, tn))
    # inv_out_scale may be a Python float under static scales
    # (StaticScale trace-time constants, round 4) — coerce, don't .astype
    ios = jnp.reshape(
        jnp.asarray(inv_out_scale if out_int8 else 1.0, jnp.float32), (1,)
    )
    return pl.pallas_call(
        functools.partial(_kernel_1x1, act=act, out_int8=out_int8),
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.int8 if out_int8 else out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, wq, scale.reshape(1, cout).astype(jnp.float32),
      bias.reshape(1, cout).astype(jnp.float32), ios)


# ---------------------------------------------------------------------------
# 3x3 stride-1: halo-DMA row tiles, 9 accumulated matmuls
# ---------------------------------------------------------------------------

def _kernel_3x3(x_ref, w_ref, sc_ref, b_ref, ios_ref, out_ref, *,
                h, w, c, p_w, chunk, act, out_int8):
    # Full-image block (grid is over N): the 1-row/1-col halo becomes plain
    # zero padding, so no overlapping-block machinery is needed.  Manual
    # halo DMA is NOT an option here: Mosaic requires HBM memref slices to
    # be tile-aligned on the minor two dims ((8,128) for int8), which W/C
    # like (20, 64) violate.
    v = x_ref[0]  # (H, W, C) int8
    # Width-padded flattening: out flat i = y*P + x needs in flat
    # i + dy*P + dx — each tap is a constant-offset row window.  P is the
    # width padded to a multiple of 32 (int8 sublane tile): Mosaic only
    # merges an outer dim into a tile-aligned sublane dim (unaligned merges
    # hang its compiler).  Pad cols are zero and masked off on the output
    # write; the extra MACs are noise — this kernel removes HBM traffic,
    # not FLOPs.  One extra bottom row keeps the largest offset (2P+2) in
    # range on the last chunk.
    vp = jnp.pad(v, ((1, 2), (1, p_w - w - 1), (0, 0)))
    # dy-concat: stack the three row-shifted views on the channel dim (outer
    # slices are free), turning the 9 K=C matmuls into 3 K=3C matmuls — much
    # better MXU utilization at the small-channel levels, and 3 dx-shift
    # relayouts per chunk instead of 9 tap slices
    z = jnp.concatenate([vp[0 : h + 1], vp[1 : h + 2], vp[2 : h + 3]], axis=-1)
    zf = z.reshape((h + 1) * p_w, 3 * c)
    cout = out_ref.shape[-1]
    m = chunk * p_w
    for ci in range(h // chunk):
        base = ci * m
        acc = jnp.zeros((m, cout), jnp.int32)
        for dx in range(3):
            acc = acc + jnp.dot(
                zf[base + dx : base + dx + m],
                w_ref[dx * 3 * c : (dx + 1) * 3 * c, :],
                preferred_element_type=jnp.int32,
            )
        y = _epilogue(acc, sc_ref[:], b_ref[:], ios_ref[0], act, out_int8,
                      out_ref.dtype)
        out_ref[0, ci * chunk : (ci + 1) * chunk] = (
            y.reshape(chunk, p_w, cout)[:, :w, :]
        )


def _chunk_rows(h: int, p_w: int, cout: int) -> int:
    """Largest divisor of H keeping the s32 accumulator in budget while the
    matmul M dim stays MXU-sized."""
    best = 1
    for ch in range(1, h + 1):
        if h % ch:
            continue
        if ch * p_w * cout * 4 <= 2 * 2 ** 20:
            best = ch
    return best


def qconv3x3(xq, wq, scale, bias, *, act="silu", inv_out_scale=None,
             out_dtype=jnp.bfloat16, interpret=False):
    """xq: (N, H, W, C) int8; wq: (3, 3, C, Cout) int8 HWIO; stride 1, pad 1.

    Returns (N, H, W, Cout) int8 when ``inv_out_scale`` is given, else
    ``out_dtype``.
    """
    n, h, w, c = xq.shape
    cout = wq.shape[3]
    out_int8 = inv_out_scale is not None
    p_w = -(-(w + 2) // 32) * 32
    chunk = _chunk_rows(h, p_w, cout)
    # inv_out_scale may be a Python float under static scales
    # (StaticScale trace-time constants, round 4) — coerce, don't .astype
    ios = jnp.reshape(
        jnp.asarray(inv_out_scale if out_int8 else 1.0, jnp.float32), (1,)
    )
    # dx-major stacking of dy-concat blocks: slice dx*3C:(dx+1)*3C gives
    # [W[0,dx]; W[1,dx]; W[2,dx]], matching the kernel's dy-concat channels
    w2d = wq.transpose(1, 0, 2, 3).reshape(9 * c, cout)
    return pl.pallas_call(
        functools.partial(
            _kernel_3x3, h=h, w=w, c=c, p_w=p_w, chunk=chunk, act=act,
            out_int8=out_int8,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, w, cout), jnp.int8 if out_int8 else out_dtype
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        # Mosaic's liveness for the padded value + 9 tap windows + s32
        # accumulator overruns the default 16 MB scoped-vmem budget at the
        # large-spatial levels (measured 23.7 MB at 160x160x32); v5e fits a
        # raised cap — verified bit-exact at 48 MB
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)
            if _HAS_PLTPU else None
        ),
        interpret=interpret,
    )(xq, w2d, scale.reshape(1, cout).astype(jnp.float32),
      bias.reshape(1, cout).astype(jnp.float32), ios)


def vmem_estimate_3x3(h: int, w: int, c: int, cout: int, out_bytes: int) -> int:
    """Rough per-step VMEM footprint (double-buffered in/out blocks + padded
    value + weights); the dispatcher falls back to XLA above ~12 MB."""
    p_w = -(-(w + 2) // 32) * 32
    chunk = _chunk_rows(h, p_w, cout)
    return (
        2 * h * w * c  # in block, double-buffered int8
        + (h + 3) * p_w * c  # padded value copy
        + 2 * h * w * cout * out_bytes  # out block
        + 9 * c * cout  # weights
        + chunk * p_w * cout * 4  # accumulator
    )


def qconv(xq, wq, scale, bias, *, k: int, act="silu", inv_out_scale=None,
          out_dtype=jnp.bfloat16, interpret=False):
    """Dispatch to the fused kernel for a supported conv; caller guarantees
    stride 1, groups 1, 'same' padding, int8 NHWC input."""
    n, h, w, c = xq.shape
    cout = wq.shape[3]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    if k == 1:
        y = qconv1x1(
            xq.reshape(n * h * w, c), wq.reshape(c, cout), scale, bias, act=act,
            inv_out_scale=inv_out_scale, out_dtype=out_dtype, interpret=interpret,
        )
        return y.reshape(n, h, w, cout)
    assert k == 3, k
    out_bytes = 1 if inv_out_scale is not None else jnp.dtype(out_dtype).itemsize
    if vmem_estimate_3x3(h, w, c, cout, out_bytes) > 12 * 2 ** 20:
        return None  # caller falls back to the XLA path
    return qconv3x3(
        xq, wq, scale, bias, act=act, inv_out_scale=inv_out_scale,
        out_dtype=out_dtype, interpret=interpret,
    )
