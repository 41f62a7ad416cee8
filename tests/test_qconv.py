"""Pallas fused-epilogue int8 conv: interpret-mode parity vs the XLA int8
path (ops/blocks._conv_int8 semantics).  These run in the default CPU gate;
the compiled-on-hardware twin lives in tests/test_pallas_tpu.py.

The kernel must reproduce the XLA path's integer accumulation bit-exactly
(s8 x s8 -> s32 is exact in both); the epilogue runs in f32 (vs the XLA
path's bf16), so dequantized outputs are compared at the bf16 noise floor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.ops.blocks import conv2d_nhwc
from yolort_tpu.ops.pallas import qconv as Q


def _ref(xq, wq, scale, bias, act, inv_os):
    acc = conv2d_nhwc(xq, wq, stride=1, padding=wq.shape[0] // 2,
                      preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "hardswish":
        y = y * jnp.clip(y + 3.0, 0.0, 6.0) / 6.0
    if inv_os is None:
        return y
    return jnp.clip(jnp.round(y * inv_os), -127.0, 127.0).astype(jnp.int8)


CASES = [
    (1, 2, 12, 12, 32, 64),
    (3, 2, 12, 12, 32, 64),
    (3, 1, 8, 10, 16, 32),  # W not a multiple of 8: exercises the pad-mask
    (3, 2, 16, 16, 64, 32),
]


@pytest.mark.parametrize("k,n,h,w,c,co", CASES)
@pytest.mark.parametrize("act", ["silu", "none"])
def test_qconv_interpret_parity(k, n, h, w, c, co, act):
    rng = np.random.default_rng(k * 100 + c)
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, c), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-10, 11, (k, k, c, co), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (co,)).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-1, 1, (co,)).astype(np.float32))
    ios = jnp.float32(6.0)

    out = Q.qconv(xq, wq, scale, bias, k=k, act=act, inv_out_scale=ios,
                  interpret=True)
    ref = _ref(xq, wq, scale, bias, act, ios)
    # integer accumulation identical + f32 epilogue on both sides here
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    outf = Q.qconv(xq, wq, scale, bias, k=k, act=act, inv_out_scale=None,
                   out_dtype=jnp.float32, interpret=True)
    reff = _ref(xq, wq, scale, bias, act, None)
    np.testing.assert_allclose(np.asarray(outf), np.asarray(reff), rtol=1e-6,
                               atol=1e-6)


def test_qconv_vmem_gate_falls_back():
    """Shapes past the VMEM budget must return None (XLA fallback), not OOM."""
    c, co = 64, 64
    xq = jnp.zeros((1, 512, 512, c), jnp.int8)
    wq = jnp.zeros((3, 3, c, co), jnp.int8)
    out = Q.qconv(xq, wq, jnp.ones((co,)), jnp.zeros((co,)), k=3,
                  inv_out_scale=jnp.float32(1.0), interpret=True)
    assert out is None


def test_dispatch_unsupported_returns_none():
    """blocks._conv_int8_fused must decline stride-2/grouped/k=6 convs."""
    from yolort_tpu.ops import blocks

    p = {"wq": jnp.zeros((3, 3, 8, 8), jnp.int8), "ws": jnp.ones((8,)),
         "xs": jnp.float32(1.0)}
    x = jnp.zeros((1, 8, 8, 8), jnp.bfloat16)
    assert blocks._conv_int8_fused(p, x, k=3, stride=2, padding=1, groups=1,
                                   act="silu") is None
    assert blocks._conv_int8_fused(p, x, k=3, stride=1, padding=1, groups=8,
                                   act="silu") is None
    assert blocks._conv_int8_fused(p, x, k=6, stride=2, padding=2, groups=1,
                                   act="silu") is None


def test_shape_gated_band(monkeypatch):
    """YOLORT_QCONV=band admits only the measured winning band (round-5
    per-shape sweep, tools/experiments/qconv_shapes.py): k=1, extent >=
    160x160, cin 64-128, cout >= 64.  Mode '1' admits everything; unset
    admits nothing (available() already gates that, but shape_gated must
    agree)."""
    monkeypatch.setenv("YOLORT_QCONV", "band")
    assert Q.shape_gated(1, 160, 160, 128, 64)
    assert Q.shape_gated(1, 320, 320, 64, 64)
    assert Q.shape_gated(1, 160, 160, 128, 255)
    assert not Q.shape_gated(3, 160, 160, 64, 64)      # every 3x3 loses
    assert not Q.shape_gated(1, 80, 80, 128, 128)      # small extent
    assert not Q.shape_gated(1, 160, 160, 256, 64)     # wide cin loses
    assert not Q.shape_gated(1, 320, 320, 64, 32)      # cout=32 loses
    monkeypatch.setenv("YOLORT_QCONV", "1")
    assert Q.shape_gated(3, 20, 20, 256, 256)
    monkeypatch.setenv("YOLORT_QCONV", "0")
    assert not Q.shape_gated(1, 320, 320, 64, 64)
