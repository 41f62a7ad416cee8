"""CSPDarknet backbones (r3.1 / r4.0 / r6.0), TPU-native.

Re-designs ``yolort/models/darknetv4.py`` and ``darknetv6.py`` from the
reference as a static layer plan + params pytree.  Layer indices 0..8 match
the ultralytics flat ``model.N`` numbering so checkpoint ingestion is a direct
index map (reference: yolort/models/_checkpoint.py:54-64).

Feature taps are layers [4, 6, 8] (strides 8/16/32), exactly the reference's
``returned_layers`` (yolort/models/backbone_utils.py:108).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax

import numpy as np

from yolort_tpu.ops.blocks import (
    C3,
    SPP,
    BottleneckCSP,
    Conv,
    Focus,
    Params,
    act_for_version,
    space_to_depth,
)


@dataclass(frozen=True)
class _S2DStem:
    """space_to_depth(2) + 3x3/s1 conv == the r6.0 6x6/s2 stem, exactly.

    Weight layout produced by ``stem_to_s2d``; the channel/phase ordering
    follows ops.blocks.space_to_depth ((0,0),(1,0),(0,1),(1,1))."""

    cout: int
    act: str = "silu"

    def __post_init__(self):
        object.__setattr__(self, "conv", Conv(12, self.cout, k=3, s=1, p=1, act=self.act))

    @property
    def c2(self) -> int:
        return self.cout

    def init(self, key) -> Params:
        return self.conv.init(key)

    def __call__(self, p: Params, x):
        return self.conv(p, space_to_depth(x))


def stem_to_s2d(params: Params) -> Params:
    """Remap a (6,6,3,O) stem conv weight to the equivalent (3,3,12,O)
    space-to-depth form (bias/BN untouched).  Output-identical: output pixel
    (i,j) of the 6x6/s2 conv reads original rows 2i-2..2i+3 — exactly the
    3x3 neighborhood of space-to-depth pixel (i,j) across the 4 phases."""
    stem = params["backbone"]["0"]
    w6 = np.asarray(stem["w"])
    assert w6.shape[:3] == (6, 6, 3), f"not an r6.0 stem weight: {w6.shape}"
    o = w6.shape[3]
    w3 = np.zeros((3, 3, 12, o), w6.dtype)
    phase_idx = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}
    for ky in range(6):
        for kx in range(6):
            p = phase_idx[(ky % 2, kx % 2)]
            w3[ky // 2, kx // 2, p * 3 : p * 3 + 3, :] = w6[ky, kx, :, :]
    import jax.numpy as jnp

    new_stem = dict(stem)
    new_stem["w"] = jnp.asarray(w3)
    out = dict(params)
    out["backbone"] = dict(params["backbone"])
    out["backbone"]["0"] = new_stem
    return out


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding rule (reference: yolort/models/_utils.py:10)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def depth_gain(n: int, depth_multiple: float) -> int:
    return max(round(n * depth_multiple), 1)


def _csp_block(version: str):
    return BottleneckCSP if version == "r3.1" else C3


@dataclass(frozen=True)
class DarkNet:
    """CSPDarknet feature extractor.

    r6.0 (darknetv6.py:49): 6x6/2 conv stem, stages [3,6,9] C3, tail conv+C3.
    r3.1/r4.0 (darknetv4.py:51): Focus stem, stages [3,9,9], tail conv+SPP.
    """

    depth_multiple: float
    width_multiple: float
    version: str = "r6.0"
    last_channel: int = 1024  # 768 when feeding a P6 PAN (backbone_utils.py:101)
    # TPU optimization: rewrite the 6x6/s2 stem as space-to-depth + 3x3/s1
    # conv on 12 channels — mathematically identical (see stem_to_s2d), but
    # 4x more input channels for the MXU and half the spatial extent.
    stem_s2d: bool = False

    def __post_init__(self):
        dm, wm, version = self.depth_multiple, self.width_multiple, self.version
        act = act_for_version(version)
        block = _csp_block(version)
        is_v6 = version == "r6.0"
        stages_repeats = [3, 6, 9] if is_v6 else [3, 9, 9]
        stages_out = [128, 256, 512]

        layers = []
        cin = make_divisible(64 * wm)
        if is_v6 and self.stem_s2d:
            layers.append(_S2DStem(cin, act))
        elif is_v6:
            layers.append(Conv(3, cin, k=6, s=2, p=2, act=act))
        else:
            layers.append(Focus(3, cin, k=3, act=act))
        for rep, cout in zip(stages_repeats, stages_out):
            cout = make_divisible(cout * wm)
            layers.append(Conv(cin, cout, k=3, s=2, act=act))
            layers.append(block(cout, cout, n=depth_gain(rep, dm)))
            cin = cout
        last = make_divisible(self.last_channel * wm)
        layers.append(Conv(cin, last, k=3, s=2, act=act))
        if is_v6:
            layers.append(C3(last, last, n=depth_gain(3, dm), act=act))
        else:
            layers.append(SPP(last, last, k=(5, 9, 13), act=act))

        object.__setattr__(self, "layers", tuple(layers))
        object.__setattr__(self, "returned_layers", (4, 6, 8))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        chans = []
        for i in self.returned_layers:
            layer = self.layers[i]
            chans.append(layer.c2)
        return tuple(chans)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {str(i): layer.init(k) for i, (layer, k) in enumerate(zip(self.layers, keys))}

    def __call__(self, p: Params, x):
        """Returns (P3, P4, P5) feature maps at strides (8, 16, 32), NHWC."""
        feats = []
        for i, layer in enumerate(self.layers):
            x = layer(p[str(i)], x)
            if i in self.returned_layers:
                feats.append(x)
        return tuple(feats)
