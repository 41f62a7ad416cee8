"""YOLOv5 with a MobileNetV3-Small + FPN backbone — the "bring your own
backbone" demo.

Capability parity with yolort/models/yolo_lite.py:18-194 (which borrows
torchvision's MobileNetV3 + FeaturePyramidNetwork).  Implemented natively:
a fresh MobileNetV3-Small feature extractor, a standard FPN with a max-pool
P6 extra level (4 levels, strides 8-64), and the usual YOLO head.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.models.head import P6_ANCHOR_GRIDS, P6_STRIDES
from yolort_tpu.models.yolo import YOLO
from yolort_tpu.ops.blocks import Conv, Conv2dOnly, InvertedResidual, Params

# MobileNetV3-Small block table: (kernel, expansion, out, SE, act, stride)
_MNV3_SMALL = (
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
)


@dataclass(frozen=True)
class MobileNetV3Small:
    """Feature extractor returning C3/C4/C5 taps at strides 8/16/32."""

    def __post_init__(self):
        layers = [Conv(3, 16, 3, 2, act="hardswish")]
        cin = 16
        for k, exp, cout, se, act, s in _MNV3_SMALL:
            layers.append(InvertedResidual(cin, exp, cout, k, s, use_se=se, act=act))
            cin = cout
        object.__setattr__(self, "layers", tuple(layers))
        # last block at each of strides 8/16/32 (stem=2, blocks 1,3,8 stride)
        object.__setattr__(self, "returned_layers", (3, 8, 11))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (24, 48, 96)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.layers, keys))}

    def __call__(self, p: Params, x):
        feats = []
        for i, m in enumerate(self.layers):
            x = m(p[str(i)], x)
            if i in self.returned_layers:
                feats.append(x)
        return tuple(feats)


@dataclass(frozen=True)
class FPN:
    """Feature pyramid (lateral 1x1 + top-down sum + 3x3 smooth) with a
    stride-64 max-pool extra level (torchvision FPN + LastLevelMaxPool)."""

    in_channels: Tuple[int, ...]
    out_channels: int = 128

    def __post_init__(self):
        object.__setattr__(
            self, "lateral", tuple(Conv2dOnly(c, self.out_channels, 1) for c in self.in_channels)
        )
        object.__setattr__(
            self,
            "smooth",
            tuple(Conv2dOnly(self.out_channels, self.out_channels, 3) for _ in self.in_channels),
        )

    def init(self, key) -> Params:
        keys = jax.random.split(key, 2 * len(self.in_channels))
        return {
            "lateral": {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.lateral, keys))},
            "smooth": {
                str(i): m.init(k)
                for i, (m, k) in enumerate(zip(self.smooth, keys[len(self.in_channels):]))
            },
        }

    def __call__(self, p: Params, feats: Sequence[jax.Array]):
        laterals = [m(p["lateral"][str(i)], f) for i, (m, f) in enumerate(zip(self.lateral, feats))]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(outs[0], laterals[i].shape, method="nearest")
            outs.insert(0, laterals[i] + up)
        outs = [m(p["smooth"][str(i)], o) for i, (m, o) in enumerate(zip(self.smooth, outs))]
        # extra P6 level: stride-2 max pool of the last output
        p6 = jax.lax.reduce_window(
            outs[-1], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "SAME"
        )
        return tuple(outs) + (p6,)


@dataclass(frozen=True)
class MobileNetBackboneWithFPN:
    out_channels_fpn: int = 128

    def __post_init__(self):
        body = MobileNetV3Small()
        object.__setattr__(self, "body", body)
        object.__setattr__(self, "fpn", FPN(body.out_channels, self.out_channels_fpn))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (self.out_channels_fpn,) * 4

    def init(self, key) -> Params:
        kb, kf = jax.random.split(key)
        return {"body": self.body.init(kb), "fpn": self.fpn.init(kf)}

    def __call__(self, p: Params, x):
        return self.fpn(p["fpn"], self.body(p["body"], x))


@dataclass(frozen=True)
class YOLOLite(YOLO):
    """YOLO with the MobileNetV3-Small FPN backbone (4 levels @8-64)."""

    fpn_channels: int = 128

    def __post_init__(self):
        strides = self.strides or P6_STRIDES
        anchor_grids = self.anchor_grids or P6_ANCHOR_GRIDS
        object.__setattr__(self, "strides", tuple(strides))
        object.__setattr__(self, "anchor_grids", tuple(tuple(a) for a in anchor_grids))

        from yolort_tpu.models.head import YOLOHead

        backbone = MobileNetBackboneWithFPN(self.fpn_channels)
        head = YOLOHead(
            backbone.out_channels,
            num_anchors=len(self.anchor_grids[0]) // 2,
            strides=self.strides,
            num_classes=self.num_classes,
        )
        object.__setattr__(self, "backbone", backbone)
        object.__setattr__(self, "pan", None)
        object.__setattr__(self, "head", head)

    def features(self, params: Params, images: jax.Array):
        return self.backbone(params["backbone"], images)

    def init(self, key) -> Params:
        kb, kh = jax.random.split(key)
        return {"backbone": self.backbone.init(kb), "head": self.head.init(kh)}


def yolov5_mobilenet_v3_small_fpn(
    pretrained: bool = False,
    progress: bool = True,
    num_classes: int = 80,
    **kwargs,
) -> YOLOLite:
    """Factory parity with reference yolo_lite.py:156 (demo model; no
    pretrained weights exist upstream either)."""
    if pretrained:
        raise NotImplementedError("no pretrained yolo_lite weights exist (same upstream)")
    return YOLOLite(depth_multiple=0.33, width_multiple=0.5, num_classes=num_classes, **kwargs)
