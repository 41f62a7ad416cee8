"""Experimental blocks.

Capability parity with yolort/v5/models/experimental.py (CrossConv:13,
Sum:27, MixConv2d:48, Ensemble:74) — written fresh on the functional block
system.  Model ensembling lives in yolort_tpu.models.ensemble."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.ops.blocks import Conv, Params, conv2d_nhwc


@dataclass(frozen=True)
class CrossConv:
    """Downsample via 1xk + kx1 cross convolution (experimental.py:13)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False

    def __post_init__(self):
        c_ = int(self.c2 * self.e)
        object.__setattr__(self, "cv1", _RectConv(self.c1, c_, (1, self.k), (1, self.s)))
        object.__setattr__(self, "cv2", _RectConv(c_, self.c2, (self.k, 1), (self.s, 1), g=self.g))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, p: Params, x):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x))
        return x + y if (self.shortcut and self.c1 == self.c2) else y


@dataclass(frozen=True)
class _RectConv:
    """Conv+BN+SiLU with a rectangular kernel."""

    c1: int
    c2: int
    k: Tuple[int, int]
    s: Tuple[int, int]
    g: int = 1

    def init(self, key) -> Params:
        import math

        kh, kw = self.k
        fan_in = kh * kw * (self.c1 // self.g)
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(key, (kh, kw, self.c1 // self.g, self.c2), jnp.float32, -bound, bound)
        return {"w": w, "b": jnp.zeros((self.c2,), jnp.float32)}

    def __call__(self, p: Params, x):
        kh, kw = self.k
        y = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=self.s,
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=self.g,
        )
        y = y + p["b"].astype(y.dtype)
        return y * jax.nn.sigmoid(y)


@dataclass(frozen=True)
class Sum:
    """(Weighted) sum of inputs (experimental.py:27)."""

    n: int
    weight: bool = False

    def init(self, key) -> Params:
        if self.weight:
            return {"w": -jnp.arange(1.0, self.n) / 2.0}
        return {}

    def __call__(self, p: Params, xs: Sequence[jax.Array]):
        y = xs[0]
        if self.weight:
            w = jax.nn.sigmoid(p["w"]) * 2.0
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


@dataclass(frozen=True)
class MixConv2d:
    """Mixed depth-wise kernel sizes across channel groups (experimental.py:48)."""

    c1: int
    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1

    def __post_init__(self):
        n = len(self.k)
        # equal channel split per kernel
        splits = [self.c2 // n] * n
        splits[0] += self.c2 - sum(splits)
        convs = tuple(
            Conv(self.c1, c_out, k=kk, s=self.s, act="silu")
            for c_out, kk in zip(splits, self.k)
        )
        object.__setattr__(self, "convs", convs)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.convs))
        return {str(i): m.init(kk) for i, (m, kk) in enumerate(zip(self.convs, keys))}

    def __call__(self, p: Params, x):
        return jnp.concatenate(
            [m(p[str(i)], x) for i, m in enumerate(self.convs)], axis=-1
        )
