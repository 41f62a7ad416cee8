"""TPU-native YOLOv5 building blocks.

Functional re-design of the block zoo the reference keeps in
``yolort/v5/models/common.py`` (Conv:42, Bottleneck:94, BottleneckCSP:119,
C3:149, SPP:176, SPPF:190, Focus:210, C3TR:362 in the reference repo).

Design notes (TPU-first, not a port):
  * NHWC activations / HWIO weights, the layouts XLA tiles best onto the MXU.
  * Blocks are frozen dataclasses that carry *static* configuration only.
    Parameters live in a separate pytree (nested dicts of jnp arrays), so the
    whole model is a pure function ``apply(params, x)`` — jit/vmap/pjit
    compose for free.
  * BatchNorm is an eval-time affine transform; parameters are ingested
    **folded into the convolution** (see ``fuse_conv_bn``) so inference runs a
    single conv + bias + activation that XLA fuses into one MXU pass.  The
    unfused form ({'w','gamma','beta','mean','var'}) is also understood by
    ``Conv.__call__`` for training.
  * ``SPP(k=(5,9,13))`` is computed as three chained 5x5 max-pools (the SPPF
    identity: pool5(pool5(x)) == pool9(x)) — same parameters, ~7x less pooling
    work.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# BatchNorm epsilon used across the reference model zoo
# (yolort/models/darknetv6.py:111 sets bn.eps = 1e-3).
BN_EPS = 1e-3


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same' padding rule (reference: v5/models/common.py:35)."""
    return k // 2 if p is None else p


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def hardswish(x):
    # torch.nn.Hardswish: x * relu6(x + 3) / 6
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def leaky_relu01(x):
    return jnp.where(x >= 0, x, 0.1 * x)


_ACTS = {
    "silu": silu,
    "hardswish": hardswish,
    "leaky_relu": leaky_relu01,
    "none": lambda x: x,
}


def act_for_version(version: str) -> str:
    """r4.0+/r6.0 use SiLU, r3.1 uses Hardswish (common.py:62-65)."""
    return "hardswish" if version == "r3.1" else "silu"


# ---------------------------------------------------------------------------
# parameter initialisation helpers (torch-compatible distributions)
# ---------------------------------------------------------------------------

def _conv_kaiming_uniform(key, shape):
    """torch.nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) => U(-b, b)
    with b = 1/sqrt(fan_in).  shape is HWIO."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def fuse_conv_bn(w, gamma, beta, mean, var, eps: float = BN_EPS):
    """Fold eval-mode BatchNorm into conv weight/bias.

    Equivalent of the reference's fuse_conv_and_bn
    (yolort/v5/utils/torch_utils.py:218), done on HWIO numpy/jnp arrays at
    checkpoint-ingestion time.
    """
    w = np.asarray(w, dtype=np.float64)
    gamma = np.asarray(gamma, dtype=np.float64)
    beta = np.asarray(beta, dtype=np.float64)
    mean = np.asarray(mean, dtype=np.float64)
    var = np.asarray(var, dtype=np.float64)
    scale = gamma / np.sqrt(var + eps)  # (O,)
    w_f = w * scale  # broadcast over last (O) dim of HWIO
    b_f = beta - mean * scale
    return w_f.astype(np.float32), b_f.astype(np.float32)


# ---------------------------------------------------------------------------
# core conv
# ---------------------------------------------------------------------------

def conv2d_nhwc(x, w, *, stride=1, padding=0, groups=1, preferred_element_type=None):
    """Plain NHWC/HWIO convolution."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred_element_type,
    )


# --- int8 compute path ------------------------------------------------------
#
# When a conv leaf carries {'wq': int8 HWIO, 'ws': (O,) f32, 'xs': () f32}
# (produced by ops.quantization.quantize_compute_params), the conv runs on
# the MXU's native int8 path (s8 x s8 -> s32, ~2x bf16 throughput on v5e):
# the bf16 input is requantized with the calibrated per-tensor scale, the
# int32 accumulator is dequantized with xs*ws per output channel, and
# bias+activation run in the f32 epilogue that XLA fuses into the conv.
# Analogue of the reference's ppq INT8 deployment flow (deployment/ppq),
# where calibrated TensorRT engines compute in int8.

_CALIBRATION: bool = False  # set by quantization.calibrate_activations(); eager-mode only

# scale-group discovery mode (quantization.finalize_scales): when set to a
# list, the runtime-scale _qconcat records the scale objects of every concat's
# parts so the calibrated output scales feeding one concat can be unified to
# the group max — making every concat-boundary rescale pass a trace-time
# no-op once the scales are static.  Eager-mode only.
_UNIFY: Optional[list] = None


class StaticScale:
    """A per-tensor activation scale carried as a TRACE-TIME CONSTANT.

    The int8 path's remaining model-level gap vs its traffic floor is the
    glue at block boundaries: with scales as runtime f32 params, the
    ``q * (s/common)`` rescale at every concat cannot be folded by XLA
    (the ratio is a runtime value) and measurably materializes a full
    read+write pass over every part.  Scales are fixed the moment
    calibration ends, so there is no reason for them to be runtime values:
    StaticScale registers as a LEAFLESS pytree node whose value lives in
    the treedef, making every scale a compile-time constant — identity
    ratios vanish from the graph entirely and non-identity ratios fold
    into neighbouring elementwise work.  Analogue of the reference's ppq
    flow baking calibrated scales into the TensorRT engine
    (deployment/ppq/quantize.py).  Value-hashable (jit cache keys compare
    by value); treat as immutable after construction — mutating ``v``
    after a trace is cached would NOT retrigger compilation."""

    __slots__ = ("v",)

    def __init__(self, v: float):
        self.v = float(v)

    def __repr__(self):
        return f"StaticScale({self.v!r})"

    def __eq__(self, other):
        return isinstance(other, StaticScale) and other.v == self.v

    def __hash__(self):
        return hash((StaticScale, self.v))


jax.tree_util.register_pytree_node(
    StaticScale, lambda s: ((), s), lambda aux, _: aux
)


def _sv(s):
    """Concrete float of a StaticScale; identity on runtime scales."""
    return s.v if isinstance(s, StaticScale) else s


def _is_static(*ss) -> bool:
    return all(isinstance(s, StaticScale) for s in ss)


class QTensor(NamedTuple):
    """int8 activation tensor flowing BETWEEN quantized convs.

    The whole point of int8 on a bandwidth-bound model is halving the HBM
    bytes of the inter-layer activations, which only happens if the producing
    conv's epilogue writes int8 directly (XLA does not requantize into the
    producer on its own — measured: naive per-conv quantize/dequantize ADDS
    traffic).  ``q`` is the int8 payload, ``s`` the () f32 scale
    (value = q * s), and ``ref`` a zero-length dtype carrier for the float
    compute dtype to dequantize into."""

    q: jax.Array
    s: jax.Array
    ref: jax.Array

    @property
    def shape(self):
        return self.q.shape


def _as_float(x):
    """Dequantize a QTensor (identity on float tensors) — the boundary used
    by blocks/ops that have no int8-domain equivalent."""
    if isinstance(x, QTensor):
        ft = x.ref.dtype
        if isinstance(x.s, StaticScale):
            return x.q.astype(ft) * x.s.v
        return x.q.astype(ft) * x.s.astype(ft)
    return x


def _requantize(y, out_scale) -> QTensor:
    if isinstance(out_scale, StaticScale):
        q = jnp.clip(jnp.round(y * (1.0 / out_scale.v)), -127.0, 127.0)
    else:
        q = jnp.clip(jnp.round(y * (1.0 / out_scale).astype(y.dtype)), -127.0, 127.0)
    return QTensor(q.astype(jnp.int8), out_scale, jnp.zeros((0,), y.dtype))


def _qconcat(parts, axis=-1):
    """Concat that stays in int8 when every part is a QTensor (rescaling to
    the max scale in the int8 domain); falls back to float otherwise.

    When every part carries the SAME scale value (trace-time object
    identity — e.g. SPPF's input and its chained max-pools, which preserve
    the producer's scale), the rescale pass is skipped entirely: rescaling
    by s/s == 1.0 is bit-exact a no-op (integers <= 127 are exact in bf16,
    round/clip identity), but XLA cannot fold it because scales are runtime
    parameter values, so the skip saves a full read+write pass over every
    part."""
    if all(isinstance(p, QTensor) for p in parts):
        ft = parts[0].ref.dtype
        if _UNIFY is not None:
            _UNIFY.append([p.s for p in parts])
        if _is_static(*(p.s for p in parts)):
            # static scales: the per-part ratio is a trace-time constant.
            # After finalize_scales unifies every concat group to its max,
            # all ratios here are exactly 1.0 and the rescale passes are
            # absent from the compiled graph (the concat reads the conv
            # epilogues' int8 outputs directly).
            common = max(p.s.v for p in parts)
            qs = [
                p.q if p.s.v == common else
                jnp.clip(jnp.round(p.q.astype(ft) * (p.s.v / common)), -127.0, 127.0).astype(jnp.int8)
                for p in parts
            ]
            return QTensor(
                jnp.concatenate(qs, axis=axis), StaticScale(common), parts[0].ref
            )
        if all(p.s is parts[0].s for p in parts[1:]):
            return QTensor(
                jnp.concatenate([p.q for p in parts], axis=axis),
                parts[0].s, parts[0].ref,
            )
        # runtime scales (mixed static parts normalized to runtime scalars)
        ss = [jnp.asarray(_sv(p.s), jnp.float32) for p in parts]
        common = ss[0]
        for s in ss[1:]:
            common = jnp.maximum(common, s)
        qs = [
            jnp.clip(jnp.round(p.q.astype(ft) * (s / common).astype(ft)), -127.0, 127.0).astype(jnp.int8)
            for p, s in zip(parts, ss)
        ]
        return QTensor(jnp.concatenate(qs, axis=axis), common, parts[0].ref)
    return jnp.concatenate([_as_float(p) for p in parts], axis=axis)


def _qadd(a, b, out_scale=None):
    """Residual add.  Both QTensor: int8-domain add requantized to the
    calibrated post-add scale ``out_scale`` when one exists (keeps resolution
    flat through deep residual chains), else to the safe upper bound sa+sb
    (never clips beyond rounding, but loses ~1 bit per chained hop); float
    add otherwise."""
    if isinstance(a, QTensor) and isinstance(b, QTensor):
        ft = a.ref.dtype
        if _is_static(a.s, b.s) and (out_scale is None or _is_static(out_scale)):
            # static ratios fold into the (single, unavoidable) add pass;
            # a ratio of exactly 1.0 skips its multiply at trace time
            sval = (a.s.v + b.s.v) if out_scale is None else out_scale.v
            ta = a.q.astype(ft) if a.s.v == sval else a.q.astype(ft) * (a.s.v / sval)
            tb = b.q.astype(ft) if b.s.v == sval else b.q.astype(ft) * (b.s.v / sval)
            return QTensor(
                jnp.clip(jnp.round(ta + tb), -127.0, 127.0).astype(jnp.int8),
                StaticScale(sval), a.ref,
            )
        sa = jnp.asarray(_sv(a.s), jnp.float32) if isinstance(a.s, StaticScale) else a.s
        sb = jnp.asarray(_sv(b.s), jnp.float32) if isinstance(b.s, StaticScale) else b.s
        # out_scale kept by reference (NOT rewrapped): the finalize_scales
        # discovery pass matches scale leaves by object identity
        if out_scale is None:
            s = sa + sb
        elif isinstance(out_scale, StaticScale):
            s = jnp.asarray(out_scale.v, jnp.float32)
        else:
            s = out_scale
        y = a.q.astype(ft) * (sa / s).astype(ft) + b.q.astype(ft) * (sb / s).astype(ft)
        return QTensor(jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8), s, a.ref)
    return _as_float(a) + _as_float(b)


def _quantize_input(x, inv_scale):
    # quantize math runs in the activation dtype (bf16 on TPU): the VPU does
    # bf16 elementwise at 2x f32 rate, and integers up to 256 are exact in
    # bf16 so the clip/round stay faithful (the product picks up <=0.5 ulp,
    # within the +-0.5-level PTQ noise floor)
    xf = x * (inv_scale if isinstance(inv_scale, float) else inv_scale.astype(x.dtype))
    return jnp.clip(jnp.round(xf), -127.0, 127.0).astype(jnp.int8)


def _conv_int8(p: Params, x, *, stride, padding, groups):
    """int8 conv core: returns the float (bias-applied, pre-activation)
    output.  Accepts a QTensor input directly (no requantize — the producer's
    runtime scale replaces the calibrated 'xs')."""
    if isinstance(x, QTensor):
        xq, in_s, ft = x.q, x.s, x.ref.dtype
    else:
        xq, in_s, ft = _quantize_input(x, 1.0 / _sv(p["xs"])), p["xs"], x.dtype
    y = conv2d_nhwc(
        xq, p["wq"], stride=stride, padding=padding, groups=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(ft) * (_sv(in_s) * p["ws"]).astype(ft)
    if "b" in p:
        y = y + p["b"].astype(ft)
    return y


def _conv_int8_fused(p: Params, x, *, k, stride, padding, groups, act):
    """Pallas fused-epilogue int8 conv (s32 accumulator stays in VMEM, int8
    activation written directly — no s32 HBM round-trip).  Returns the
    finished QTensor/float output, or None when this conv's shape isn't
    kernel-supported (caller falls back to the XLA path)."""
    if groups != 1 or stride != 1 or k not in (1, 3) or padding != k // 2:
        return None
    from yolort_tpu.ops.pallas import qconv as _qk

    if not _qk.available():
        return None
    xr = x.q if isinstance(x, QTensor) else x
    if not _qk.shape_gated(k, xr.shape[1], xr.shape[2], xr.shape[3],
                           p["wq"].shape[3]):
        return None
    if isinstance(x, QTensor):
        xq, in_s, ft = x.q, x.s, x.ref.dtype
    else:
        xq, in_s, ft = _quantize_input(x, 1.0 / _sv(p["xs"])), p["xs"], x.dtype
    os = p.get("os")
    y = _qk.qconv(
        xq, p["wq"], _sv(in_s) * p["ws"], p.get("b"), k=k, act=act,
        inv_out_scale=(1.0 / _sv(os) if os is not None else None), out_dtype=ft,
    )
    if y is None:  # shape outside the kernel's VMEM budget
        return None
    if os is not None:
        return QTensor(y, os, jnp.zeros((0,), ft))
    return y


def _observe_calibration(p: Params, x, key: str = "_absmax") -> None:
    """Eager-mode activation-range capture: record the abs-max of this conv's
    input (or output, key='_out_absmax'; residual-add output,
    key='_add_absmax') directly into its params dict (mutation is safe —
    calibration runs outside jit), accumulating the max across batches."""
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "activation calibration observed a tracer: calibrate_activations "
            "must run the model eagerly (do not jit apply_fn during "
            "calibration — range capture mutates the params dict)"
        )
    amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    p[key] = max(float(p.get(key, 0.0)), amax)


@dataclass(frozen=True)
class Conv:
    """Conv2d + (folded) BatchNorm + activation.

    Reference: ``Conv`` in v5/models/common.py:42.  Parameters:
      fused:   {'w': (kh,kw,cin/g,cout), 'b': (cout,)}
      unfused: {'w', 'gamma', 'beta', 'mean', 'var'}  (training / raw import)
    """

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: str = "silu"

    def init(self, key) -> Params:
        w = _conv_kaiming_uniform(key, (self.k, self.k, self.c1 // self.g, self.c2))
        return {
            "w": w,
            "gamma": jnp.ones((self.c2,), jnp.float32),
            "beta": jnp.zeros((self.c2,), jnp.float32),
            "mean": jnp.zeros((self.c2,), jnp.float32),
            "var": jnp.ones((self.c2,), jnp.float32),
        }

    def __call__(self, p: Params, x):
        if "wq" in p:
            fused = _conv_int8_fused(
                p, x, k=self.k, stride=self.s, padding=autopad(self.k, self.p),
                groups=self.g, act=self.act,
            )
            if fused is not None:
                return fused
            y = _ACTS[self.act](
                _conv_int8(p, x, stride=self.s, padding=autopad(self.k, self.p), groups=self.g)
            )
            return _requantize(y, p["os"]) if "os" in p else y
        x = _as_float(x)
        if _CALIBRATION:
            _observe_calibration(p, x)
        y = conv2d_nhwc(x, p["w"], stride=self.s, padding=autopad(self.k, self.p), groups=self.g)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        else:
            scale = p["gamma"] * jax.lax.rsqrt(p["var"] + BN_EPS)
            bias = p["beta"] - p["mean"] * scale
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        y = _ACTS[self.act](y)
        if _CALIBRATION:
            _observe_calibration(p, y, "_out_absmax")
        return y


@dataclass(frozen=True)
class Conv2dOnly:
    """Bare conv2d with optional bias and no BN/act (used inside BottleneckCSP
    and for detection-head 1x1 convs). Params {'w'} or {'w','b'}."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    bias: bool = True

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        w = _conv_kaiming_uniform(kw, (self.k, self.k, self.c1 // self.g, self.c2))
        out = {"w": w}
        if self.bias:
            fan_in = self.k * self.k * (self.c1 // self.g)
            bound = 1.0 / math.sqrt(fan_in)
            out["b"] = jax.random.uniform(kb, (self.c2,), jnp.float32, -bound, bound)
        return out

    def __call__(self, p: Params, x):
        if "wq" in p:
            fused = _conv_int8_fused(
                p, x, k=self.k, stride=self.s, padding=autopad(self.k, self.p),
                groups=self.g, act="none",
            )
            if fused is not None:
                return fused
            y = _conv_int8(p, x, stride=self.s, padding=autopad(self.k, self.p), groups=self.g)
            return _requantize(y, p["os"]) if "os" in p else y
        x = _as_float(x)
        if _CALIBRATION:
            _observe_calibration(p, x)
        y = conv2d_nhwc(x, p["w"], stride=self.s, padding=autopad(self.k, self.p), groups=self.g)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y


@dataclass(frozen=True)
class BatchNorm:
    """Standalone eval-mode BatchNorm (used by BottleneckCSP on the concat).
    Params {'gamma','beta','mean','var'}."""

    c: int

    def init(self, key) -> Params:
        del key
        return {
            "gamma": jnp.ones((self.c,), jnp.float32),
            "beta": jnp.zeros((self.c,), jnp.float32),
            "mean": jnp.zeros((self.c,), jnp.float32),
            "var": jnp.ones((self.c,), jnp.float32),
        }

    def __call__(self, p: Params, x):
        scale = p["gamma"] * jax.lax.rsqrt(p["var"] + BN_EPS)
        bias = p["beta"] - p["mean"] * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Bottleneck:
    """Standard bottleneck (common.py:94): 1x1 -> 3x3 (+residual)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"

    def __post_init__(self):
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "cv1", Conv(self.c1, c_, 1, 1, act=self.act))
        object.__setattr__(self, "cv2", Conv(c_, self.c2, 3, 1, g=self.g, act=self.act))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, p: Params, x):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x))
        if not (self.shortcut and self.c1 == self.c2):
            return y
        out = _qadd(x, y, p.get("as"))
        if _CALIBRATION and not isinstance(out, QTensor):
            # post-add range: quantize_compute_params turns it into the 'as'
            # scale so chained residual adds requantize to a calibrated scale
            # instead of the resolution-losing sa+sb upper bound
            _observe_calibration(p, out, "_add_absmax")
        return out


@dataclass(frozen=True)
class C3:
    """CSP bottleneck with 3 convolutions (common.py:149)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"

    def __post_init__(self):
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "cv1", Conv(self.c1, c_, 1, 1, act=self.act))
        object.__setattr__(self, "cv2", Conv(self.c1, c_, 1, 1, act=self.act))
        object.__setattr__(self, "cv3", Conv(2 * c_, self.c2, 1, act=self.act))
        object.__setattr__(
            self,
            "m",
            tuple(Bottleneck(c_, c_, self.shortcut, self.g, e=1.0, act=self.act) for _ in range(self.n)),
        )

    def init(self, key) -> Params:
        keys = jax.random.split(key, 3 + self.n)
        return {
            "cv1": self.cv1.init(keys[0]),
            "cv2": self.cv2.init(keys[1]),
            "cv3": self.cv3.init(keys[2]),
            "m": {str(i): b.init(keys[3 + i]) for i, b in enumerate(self.m)},
        }

    def __call__(self, p: Params, x):
        y1 = self.cv1(p["cv1"], x)
        for i, b in enumerate(self.m):
            y1 = b(p["m"][str(i)], y1)
        y2 = self.cv2(p["cv2"], x)
        return self.cv3(p["cv3"], _qconcat([y1, y2], axis=-1))


@dataclass(frozen=True)
class BottleneckCSP:
    """r3.1-era CSP bottleneck (common.py:119): raw convs + BN + LeakyReLU."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def __post_init__(self):
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "cv1", Conv(self.c1, c_, 1, 1, act="hardswish"))
        object.__setattr__(self, "cv2", Conv2dOnly(self.c1, c_, 1, 1, bias=False))
        object.__setattr__(self, "cv3", Conv2dOnly(c_, c_, 1, 1, bias=False))
        object.__setattr__(self, "cv4", Conv(2 * c_, self.c2, 1, 1, act="hardswish"))
        object.__setattr__(self, "bn", BatchNorm(2 * c_))
        object.__setattr__(
            self,
            "m",
            tuple(
                Bottleneck(c_, c_, self.shortcut, self.g, e=1.0, act="hardswish")
                for _ in range(self.n)
            ),
        )

    def init(self, key) -> Params:
        keys = jax.random.split(key, 5 + self.n)
        return {
            "cv1": self.cv1.init(keys[0]),
            "cv2": self.cv2.init(keys[1]),
            "cv3": self.cv3.init(keys[2]),
            "cv4": self.cv4.init(keys[3]),
            "bn": self.bn.init(keys[4]),
            "m": {str(i): b.init(keys[5 + i]) for i, b in enumerate(self.m)},
        }

    def __call__(self, p: Params, x):
        y1 = self.cv1(p["cv1"], x)
        for i, b in enumerate(self.m):
            y1 = b(p["m"][str(i)], y1)
        y1 = self.cv3(p["cv3"], y1)
        y2 = self.cv2(p["cv2"], x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = leaky_relu01(self.bn(p["bn"], y))
        return self.cv4(p["cv4"], y)


def max_pool_same(x, k: int):
    """k x k max pool, stride 1, 'same' (pad k//2), NHWC."""
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else np.int8(jnp.iinfo(x.dtype).min) if x.dtype == jnp.int8 else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


@dataclass(frozen=True)
class SPP:
    """Spatial pyramid pooling (common.py:176).

    For the default k=(5,9,13) the pools are computed as a chain of three 5x5
    pools (SPPF identity, common.py:190-207) — bit-identical output, same
    parameter layout, less HBM traffic.
    """

    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    act: str = "silu"

    def __post_init__(self):
        c_ = self.c1 // 2
        object.__setattr__(self, "cv1", Conv(self.c1, c_, 1, 1, act=self.act))
        object.__setattr__(self, "cv2", Conv(c_ * (len(self.k) + 1), self.c2, 1, 1, act=self.act))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, p: Params, x):
        x = self.cv1(p["cv1"], x)

        def pool(v, k):
            # max is monotonic: pooling commutes with dequantization, so a
            # QTensor pools in the int8 domain under the same scale
            if isinstance(v, QTensor):
                return QTensor(max_pool_same(v.q, k), v.s, v.ref)
            return max_pool_same(v, k)

        if self.k == (5, 9, 13):
            y1 = pool(x, 5)
            y2 = pool(y1, 5)
            y3 = pool(y2, 5)
            pooled = [y1, y2, y3]
        else:
            pooled = [pool(x, k) for k in self.k]
        return self.cv2(p["cv2"], _qconcat([x] + pooled, axis=-1))


# SPPF has the exact same parameters as SPP(k=(5,9,13)); alias for clarity.
def SPPF(c1: int, c2: int, k: int = 5, act: str = "silu") -> SPP:
    assert k == 5
    return SPP(c1, c2, (5, 9, 13), act=act)


def space_to_depth(x):
    """(N,H,W,C) -> (N,H/2,W/2,4C) with YOLOv5 Focus channel order.

    The reference concatenates [x[::2,::2], x[1::2,::2], x[::2,1::2],
    x[1::2,1::2]] over channels (common.py:237-240, NCHW).  We reproduce that
    exact channel ordering in NHWC so imported weights line up.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    # order: (dh, dw) in [(0,0), (1,0), (0,1), (1,1)] -> stack then merge with C
    parts = [x[:, :, 0, :, 0, :], x[:, :, 1, :, 0, :], x[:, :, 0, :, 1, :], x[:, :, 1, :, 1, :]]
    return jnp.concatenate(parts, axis=-1)


@dataclass(frozen=True)
class Focus:
    """Focus wh into channel space then conv (common.py:210)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: str = "silu"

    def __post_init__(self):
        object.__setattr__(self, "conv", Conv(self.c1 * 4, self.c2, self.k, self.s, self.p, self.g, act=self.act))

    def init(self, key) -> Params:
        return {"conv": self.conv.init(key)}

    def __call__(self, p: Params, x):
        return self.conv(p["conv"], space_to_depth(_as_float(x)))


def upsample2x(x):
    """Nearest-neighbour 2x upsample, NHWC (reference: nn.Upsample(scale_factor=2))."""
    if isinstance(x, QTensor):
        return QTensor(upsample2x(x.q), x.s, x.ref)
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# transformer blocks (C3TR / TAN variant)
# ---------------------------------------------------------------------------

def DWConv(c1: int, c2: int, k: int = 1, s: int = 1, act: str = "silu") -> "Conv":
    """Depth-wise convolution (common.py:76): groups = gcd(c1, c2)."""
    return Conv(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


@dataclass(frozen=True)
class GhostConv:
    """Ghost convolution (common.py:386): half the channels from a primary
    conv, half from a cheap 5x5 depthwise on those."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: str = "silu"

    def __post_init__(self):
        c_ = self.c2 // 2
        object.__setattr__(self, "cv1", Conv(self.c1, c_, self.k, self.s, act=self.act))
        object.__setattr__(self, "cv2", Conv(c_, c_, 5, 1, g=c_, act=self.act))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, p: Params, x):
        y = self.cv1(p["cv1"], x)
        return _qconcat([y, self.cv2(p["cv2"], y)], axis=-1)


@dataclass(frozen=True)
class GhostBottleneck:
    """Ghost bottleneck (common.py:399)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1

    def __post_init__(self):
        c_ = self.c2 // 2
        conv = [GhostConv(self.c1, c_, 1, 1)]
        if self.s == 2:
            conv.append(DWConv(c_, c_, self.k, self.s, act="none"))
        conv.append(GhostConv(c_, self.c2, 1, 1, act="none"))
        object.__setattr__(self, "conv", tuple(conv))
        shortcut = (
            (DWConv(self.c1, self.c1, self.k, self.s, act="none"),
             Conv(self.c1, self.c2, 1, 1, act="none"))
            if self.s == 2
            else None
        )
        object.__setattr__(self, "shortcut", shortcut)

    def init(self, key) -> Params:
        n = len(self.conv) + (len(self.shortcut) if self.shortcut else 0)
        keys = jax.random.split(key, n)
        out = {"conv": {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.conv, keys))}}
        if self.shortcut:
            out["shortcut"] = {
                str(i): m.init(k)
                for i, (m, k) in enumerate(zip(self.shortcut, keys[len(self.conv):]))
            }
        return out

    def __call__(self, p: Params, x):
        y = x
        for i, m in enumerate(self.conv):
            y = m(p["conv"][str(i)], y)
        if self.shortcut:
            s = x
            for i, m in enumerate(self.shortcut):
                s = m(p["shortcut"][str(i)], s)
        else:
            s = x
        return _qadd(y, s)


@dataclass(frozen=True)
class C3Ghost(C3):
    """C3 with GhostBottleneck inners (common.py:378)."""

    def __post_init__(self):
        super().__post_init__()
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "m", tuple(GhostBottleneck(c_, c_) for _ in range(self.n)))


def contract(x, gain: int = 2):
    """(N,H,W,C) -> (N,H/g,W/g,C*g*g) (common.py:419, NHWC form)."""
    if isinstance(x, QTensor):
        return QTensor(contract(x.q, gain), x.s, x.ref)
    n, h, w, c = x.shape
    g = gain
    x = x.reshape(n, h // g, g, w // g, g, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // g, w // g, c * g * g)


def expand(x, gain: int = 2):
    """(N,H,W,C) -> (N,H*g,W*g,C/(g*g)) (common.py:434, NHWC form)."""
    if isinstance(x, QTensor):
        return QTensor(expand(x.q, gain), x.s, x.ref)
    n, h, w, c = x.shape
    g = gain
    x = x.reshape(n, h, w, g, g, c // (g * g))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * g, w * g, c // (g * g))


@dataclass(frozen=True)
class Classify:
    """Classification head: global pool + 1x1 conv (common.py:679)."""

    c1: int
    c2: int

    def __post_init__(self):
        object.__setattr__(self, "conv", Conv2dOnly(self.c1, self.c2, 1, bias=True))

    def init(self, key) -> Params:
        return {"conv": self.conv.init(key)}

    def __call__(self, p: Params, x):
        x = _as_float(x)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        return self.conv(p["conv"], pooled).reshape(x.shape[0], -1)


def relu(x):
    return jnp.maximum(x, 0.0)


def hardsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


_ACTS["relu"] = relu


@dataclass(frozen=True)
class SqueezeExcite:
    """SE attention (MobileNetV3 style: relu -> hardsigmoid gate)."""

    c: int
    squeeze: int

    def __post_init__(self):
        object.__setattr__(self, "fc1", Conv2dOnly(self.c, self.squeeze, 1, bias=True))
        object.__setattr__(self, "fc2", Conv2dOnly(self.squeeze, self.c, 1, bias=True))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"fc1": self.fc1.init(k1), "fc2": self.fc2.init(k2)}

    def __call__(self, p: Params, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = relu(self.fc1(p["fc1"], s))
        return x * hardsigmoid(self.fc2(p["fc2"], s))


@dataclass(frozen=True)
class InvertedResidual:
    """MobileNetV3 inverted residual: expand 1x1 -> depthwise kxk -> SE ->
    project 1x1, residual when stride 1 and cin == cout."""

    cin: int
    exp: int
    cout: int
    k: int = 3
    s: int = 1
    use_se: bool = False
    act: str = "hardswish"  # 'relu' for the early MNv3 stages

    def __post_init__(self):
        layers = {}
        if self.exp != self.cin:
            layers["expand"] = Conv(self.cin, self.exp, 1, act=self.act)
        layers["dw"] = Conv(self.exp, self.exp, self.k, self.s, g=self.exp, act=self.act)
        if self.use_se:
            layers["se"] = SqueezeExcite(self.exp, _make_div8(self.exp // 4))
        layers["project"] = Conv(self.exp, self.cout, 1, act="none")
        object.__setattr__(self, "layers", layers)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {name: m.init(k) for (name, m), k in zip(self.layers.items(), keys)}

    def __call__(self, p: Params, x):
        y = x
        if "expand" in self.layers:
            y = self.layers["expand"](p["expand"], y)
        y = self.layers["dw"](p["dw"], y)
        if "se" in self.layers:
            y = self.layers["se"](p["se"], y)
        y = self.layers["project"](p["project"], y)
        return _qadd(x, y) if (self.s == 1 and self.cin == self.cout) else y


def _make_div8(v: int) -> int:
    nv = max(8, int(v + 4) // 8 * 8)
    return nv + 8 if nv < 0.9 * v else nv


@dataclass(frozen=True)
class Linear:
    cin: int
    cout: int
    bias: bool = True

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.cin)
        out = {"w": jax.random.uniform(k1, (self.cin, self.cout), jnp.float32, -bound, bound)}
        if self.bias:
            out["b"] = jax.random.uniform(k2, (self.cout,), jnp.float32, -bound, bound)
        return out

    def __call__(self, p: Params, x):
        y = x @ p["w"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y


@dataclass(frozen=True)
class TransformerLayer:
    """LayerNorm-free transformer layer (common.py:308).

    Matches torch.nn.MultiheadAttention semantics with in/out projections.
    Params: q,k,v (Linear no bias), in_proj_w/in_proj_b/out_proj (attention),
    fc1, fc2.
    """

    c: int
    num_heads: int

    def init(self, key) -> Params:
        ks = jax.random.split(key, 7)
        lin = Linear(self.c, self.c, bias=False)
        # nn.MultiheadAttention: in_proj (3c, c) xavier_uniform, out_proj Linear
        bound = math.sqrt(6.0 / (self.c + 3 * self.c))
        in_proj_w = jax.random.uniform(ks[3], (3 * self.c, self.c), jnp.float32, -bound, bound)
        out_proj = Linear(self.c, self.c, bias=True)
        return {
            "q": lin.init(ks[0]),
            "k": lin.init(ks[1]),
            "v": lin.init(ks[2]),
            "in_proj_w": in_proj_w,
            "in_proj_b": jnp.zeros((3 * self.c,), jnp.float32),
            "out_proj": out_proj.init(ks[4]),
            "fc1": lin.init(ks[5]),
            "fc2": lin.init(ks[6]),
        }

    def __call__(self, p: Params, x):
        # x: (L, N, C) to mirror torch MultiheadAttention's default layout
        c, h = self.c, self.num_heads
        lin = Linear(c, c, bias=False)
        q = lin(p["q"], x)
        k = lin(p["k"], x)
        v = lin(p["v"], x)
        wq, wk, wv = jnp.split(p["in_proj_w"].astype(x.dtype), 3, axis=0)
        bq, bk, bv = jnp.split(p["in_proj_b"].astype(x.dtype), 3, axis=0)
        q = q @ wq.T + bq
        k = k @ wk.T + bk
        v = v @ wv.T + bv
        L, N, _ = q.shape
        hd = c // h

        def split_heads(t):  # (L,N,C) -> (N*h, L, hd)
            return t.reshape(L, N * h, hd).transpose(1, 0, 2)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        attn = jax.nn.softmax((qh * (1.0 / math.sqrt(hd))) @ kh.transpose(0, 2, 1), axis=-1)
        out = attn @ vh  # (N*h, L, hd)
        out = out.transpose(1, 0, 2).reshape(L, N, c)
        out_proj = Linear(c, c, bias=True)
        x = out_proj(p["out_proj"], out) + x
        x = lin(p["fc2"], lin(p["fc1"], x)) + x
        return x


@dataclass(frozen=True)
class TransformerBlock:
    """Vision-transformer block over flattened feature map (common.py:334)."""

    c1: int
    c2: int
    num_heads: int
    num_layers: int

    def __post_init__(self):
        conv = Conv(self.c1, self.c2, act="silu") if self.c1 != self.c2 else None
        object.__setattr__(self, "conv", conv)
        object.__setattr__(self, "linear", Linear(self.c2, self.c2, bias=True))
        object.__setattr__(
            self, "tr", tuple(TransformerLayer(self.c2, self.num_heads) for _ in range(self.num_layers))
        )

    def init(self, key) -> Params:
        keys = jax.random.split(key, 2 + self.num_layers)
        out = {"linear": self.linear.init(keys[0])}
        if self.conv is not None:
            out["conv"] = self.conv.init(keys[1])
        out["tr"] = {str(i): t.init(keys[2 + i]) for i, t in enumerate(self.tr)}
        return out

    def __call__(self, p: Params, x):
        x = _as_float(x)
        if self.conv is not None:
            x = self.conv(p["conv"], x)
        x = _as_float(x)
        n, h, w, c = x.shape
        # reference flattens NCHW to (H*W, N, C); NHWC flatten gives same token order
        tokens = x.reshape(n, h * w, c).transpose(1, 0, 2)
        tokens = tokens + self.linear(p["linear"], tokens)
        for i, t in enumerate(self.tr):
            tokens = t(p["tr"][str(i)], tokens)
        return tokens.transpose(1, 0, 2).reshape(n, h, w, c)


@dataclass(frozen=True)
class C3TR:
    """C3 with a TransformerBlock inner (common.py:362)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def __post_init__(self):
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "cv1", Conv(self.c1, c_, 1, 1, act="silu"))
        object.__setattr__(self, "cv2", Conv(self.c1, c_, 1, 1, act="silu"))
        object.__setattr__(self, "cv3", Conv(2 * c_, self.c2, 1, act="silu"))
        object.__setattr__(self, "m", TransformerBlock(c_, c_, 4, self.n))

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        return {
            "cv1": self.cv1.init(ks[0]),
            "cv2": self.cv2.init(ks[1]),
            "cv3": self.cv3.init(ks[2]),
            "m": self.m.init(ks[3]),
        }

    def __call__(self, p: Params, x):
        y1 = self.m(p["m"], self.cv1(p["cv1"], x))
        y2 = self.cv2(p["cv2"], x)
        return self.cv3(p["cv3"], _qconcat([y1, y2], axis=-1))
