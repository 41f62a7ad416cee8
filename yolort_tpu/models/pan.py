"""Path Aggregation Network neck (+P6 / transformer variants), TPU-native.

Re-design of ``yolort/models/path_aggregation_network.py`` (class :44,
forward :199) and the TAN variant (``yolort/models/transformer.py:78``) as a
pure function over a params pytree.

Parameter keys mirror the reference's ``inner_blocks`` / ``layer_blocks`` /
``intermediate_blocks.p6`` indices (upsample slots carry no params), so the
ultralytics checkpoint index maps (reference _checkpoint.py:54-64) apply
directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.models.darknet import depth_gain
from yolort_tpu.ops.blocks import (
    C3,
    C3TR,
    SPP,
    BottleneckCSP,
    Conv,
    Params,
    act_for_version,
    upsample2x,
    _qconcat,
)


def _block_for(version: str):
    # PAN internals use the r4.0 block set even for r6.0 models
    # (path_aggregation_network.py:87).
    return BottleneckCSP if version == "r3.1" else C3


@dataclass(frozen=True)
class PathAggregationNetwork:
    """PANet over 3 (or 4 with P6) feature levels.

    ``in_channels`` are the backbone tap channels, lowest stride first, e.g.
    [128, 256, 512] for yolov5s (backbone_utils.py:112-113).
    """

    in_channels: Tuple[int, ...]
    depth_multiple: float
    version: str = "r6.0"
    use_p6: bool = False
    first_inner: str = "auto"  # "auto" | "c3tr" (TAN variant)

    def __post_init__(self):
        ch = self.in_channels
        version = self.version
        module_version = "r3.1" if version == "r3.1" else "r4.0"
        act = act_for_version(module_version)
        block = _block_for(version)
        dg = depth_gain(3, self.depth_multiple)

        if self.use_p6:
            assert len(ch) == 4, "P6 PAN needs 4 channel taps"
            p6 = (
                Conv(ch[2], ch[3], k=3, s=2, act=act),
                block(ch[3], ch[3], n=dg),
            )
        else:
            assert len(ch) == 3, "PAN needs 3 channel taps"
            p6 = None
        object.__setattr__(self, "p6_blocks", p6)

        # --- inner (top-down / lateral) blocks -----------------------------
        if self.first_inner == "c3tr":
            init_block = C3TR(ch[-1], ch[-1], n=dg, shortcut=False)
        elif version == "r6.0":
            init_block = SPP(ch[-1], ch[-1], k=(5, 9, 13), act=act)
        else:
            init_block = block(ch[-1], ch[-1], n=dg, shortcut=False)

        inner = [init_block]
        if self.use_p6:
            inner += [
                Conv(ch[-1], ch[2], 1, 1, act=act),
                None,  # upsample
                block(ch[1] + ch[-1], ch[2], n=dg, shortcut=False),
            ]
        inner += [
            Conv(ch[2], ch[1], 1, 1, act=act),
            None,  # upsample
            block(ch[-1] if not self.use_p6 else 2 * ch[1], ch[1], n=dg, shortcut=False),
            Conv(ch[1], ch[0], 1, 1, act=act),
            None,  # upsample
        ]
        object.__setattr__(self, "inner_blocks", tuple(inner))

        # --- layer (bottom-up) blocks --------------------------------------
        layer = [
            block(ch[1], ch[0], n=dg, shortcut=False),
            Conv(ch[0], ch[0], 3, 2, act=act),
            block(ch[1], ch[1], n=dg, shortcut=False),
            Conv(ch[1], ch[1], 3, 2, act=act),
            block(2 * ch[1], ch[2], n=dg, shortcut=False),
        ]
        if self.use_p6:
            layer += [
                Conv(ch[2], ch[2], 3, 2, act=act),
                block(2 * ch[2], ch[-1], n=dg, shortcut=False),
            ]
        object.__setattr__(self, "layer_blocks", tuple(layer))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(self.in_channels)

    def init(self, key) -> Params:
        n_inner = len(self.inner_blocks)
        n_layer = len(self.layer_blocks)
        n_p6 = len(self.p6_blocks) if self.p6_blocks else 0
        keys = jax.random.split(key, n_inner + n_layer + n_p6)
        out: Params = {
            "inner": {
                str(i): b.init(keys[i])
                for i, b in enumerate(self.inner_blocks)
                if b is not None
            },
            "layer": {
                str(i): b.init(keys[n_inner + i]) for i, b in enumerate(self.layer_blocks)
            },
        }
        if self.p6_blocks:
            out["p6"] = {
                str(i): b.init(keys[n_inner + n_layer + i]) for i, b in enumerate(self.p6_blocks)
            }
        return out

    def __call__(self, p: Params, feats: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        """feats: backbone taps (P3, P4, P5), NHWC. Returns PAN outputs, one
        per level, lowest stride first (forward semantics of
        path_aggregation_network.py:199-239)."""
        x = list(feats)
        if self.p6_blocks is not None:
            y = x[-1]
            for i, b in enumerate(self.p6_blocks):
                y = b(p["p6"][str(i)], y)
            x.append(y)

        num_features = len(x)
        inner = self.inner_blocks
        # Descending the feature pyramid
        inners = []
        last = x[-1]
        for idx in range(num_features - 1):
            last = inner[3 * idx](p["inner"][str(3 * idx)], last)
            last = inner[3 * idx + 1](p["inner"][str(3 * idx + 1)], last)
            inners.insert(0, last)
            last = upsample2x(last)
            last = _qconcat([last, x[num_features - idx - 2]], axis=-1)
        inners.insert(0, last)

        # Ascending the feature pyramid
        layer = self.layer_blocks
        results = [layer[0](p["layer"]["0"], inners[0])]
        last = results[0]
        for idx in range(num_features - 1):
            last = layer[2 * idx + 1](p["layer"][str(2 * idx + 1)], last)
            last = _qconcat([last, inners[idx + 1]], axis=-1)
            last = layer[2 * idx + 2](p["layer"][str(2 * idx + 2)], last)
            results.append(last)

        return tuple(results)
