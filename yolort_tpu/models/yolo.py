"""YOLO model assembly: backbone -> PAN -> head -> decode -> NMS.

Re-design of ``yolort/models/yolo.py:38`` (class YOLO) as a static spec +
pure apply functions over one params pytree.  The whole inference pipeline
(including NMS) traces into a single XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.models.darknet import DarkNet
from yolort_tpu.models.head import (
    DEFAULT_ANCHOR_GRIDS,
    DEFAULT_STRIDES,
    P6_ANCHOR_GRIDS,
    P6_STRIDES,
    YOLOHead,
    concat_pred_logits,
)
from yolort_tpu.models.pan import PathAggregationNetwork
from yolort_tpu.ops.blocks import Params
from yolort_tpu.ops.nms import Detections, batched_postprocess


@dataclass(frozen=True)
class YOLO:
    """Static YOLO architecture description.

    ``depth_multiple``/``width_multiple``/``version`` select the family
    exactly as the reference factories do (yolort/models/yolo.py:292-864).
    """

    depth_multiple: float
    width_multiple: float
    version: str = "r6.0"
    num_classes: int = 80
    use_p6: bool = False
    use_tan: bool = False
    strides: Optional[Tuple[int, ...]] = None
    anchor_grids: Optional[Tuple[Tuple[float, ...], ...]] = None
    # post-process config (reference yolo.py:77-79 defaults)
    score_thresh: float = 0.005
    nms_thresh: float = 0.45
    detections_per_img: int = 300
    pre_nms_topk: int = 4096
    pre_nms_anchors: Optional[int] = None  # None => pre_nms_topk (exact)
    nms_tile_size: int = 256
    nms_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    classes_per_anchor: Optional[int] = None  # None = exact multi-label
    selection: str = "auto"  # 'auto' | 'single' | 'two_stage' (ops/nms.py)
    stem_s2d: bool = False  # r6.0 only: space-to-depth stem (see darknet.stem_to_s2d)
    # lane-padded head + postprocess path (ops/nms.py
    # _single_image_nms_padded): a measured NEGATIVE result on v5e — the
    # wider head convs + padded flatten cost more than the lane-aligned
    # stage-1 saves (eval 1640 vs 1723 imgs/s at batch 128; docs/PERF.md
    # "Negative results").  Kept as a tested option ('auto'/False = off,
    # True = force); final Detections identical to the default path.
    head_pad: object = "auto"

    def __post_init__(self):
        strides = self.strides or (P6_STRIDES if self.use_p6 else DEFAULT_STRIDES)
        anchor_grids = self.anchor_grids or (
            P6_ANCHOR_GRIDS if self.use_p6 else DEFAULT_ANCHOR_GRIDS
        )
        object.__setattr__(self, "strides", tuple(strides))
        object.__setattr__(self, "anchor_grids", tuple(tuple(a) for a in anchor_grids))

        last_channel = 768 if self.use_p6 else 1024
        backbone = DarkNet(
            self.depth_multiple,
            self.width_multiple,
            self.version,
            last_channel=last_channel,
            stem_s2d=self.stem_s2d,
        )
        from yolort_tpu.models.darknet import make_divisible

        grow_widths = [256, 512, 768, 1024] if self.use_p6 else [256, 512, 1024]
        # same rounding DarkNet applies internally, so backbone taps and
        # PAN/head agree for any custom width_multiple (e.g. 0.6)
        in_channels = tuple(make_divisible(gw * self.width_multiple, 8) for gw in grow_widths)
        pan = PathAggregationNetwork(
            in_channels,
            self.depth_multiple,
            version=self.version,
            use_p6=self.use_p6,
            first_inner="c3tr" if self.use_tan else "auto",
        )
        head = YOLOHead(
            in_channels,
            num_anchors=len(self.anchor_grids[0]) // 2,
            strides=self.strides,
            num_classes=self.num_classes,
        )
        object.__setattr__(self, "backbone", backbone)
        object.__setattr__(self, "pan", pan)
        object.__setattr__(self, "head", head)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_grids[0]) // 2

    # ------------------------------------------------------------------
    def init(self, key) -> Params:
        kb, kp, kh = jax.random.split(key, 3)
        return {
            "backbone": self.backbone.init(kb),
            "pan": self.pan.init(kp),
            "head": self.head.init(kh),
        }

    def features(self, params: Params, images: jax.Array) -> Tuple[jax.Array, ...]:
        """images: (B, H, W, 3) letterboxed float. Returns PAN outputs."""
        feats = self.backbone(params["backbone"], images)
        return self.pan(params["pan"], feats)

    def head_outputs(self, params: Params, images: jax.Array) -> List[jax.Array]:
        """Per-level raw logits (B, Hl, Wl, A*(5+nc)), NHWC."""
        return self.head(params["head"], self.features(params, images))

    def decode(self, params: Params, images: jax.Array) -> jax.Array:
        """Decoded predictions (B, total_anchors, 5+nc) in canvas pixels.

        This is the export surface the reference calls ``LogitsDecoder``
        (relay/logits_decoder.py:10) — everything but the NMS."""
        outs = self.head_outputs(params, images)
        grid_sizes = [o.shape[1:3] for o in outs]
        return concat_pred_logits(outs, grid_sizes, self.strides, self.anchor_grids)

    def __call__(self, params: Params, images: jax.Array) -> Detections:
        """Full in-graph inference: images (B,H,W,3) -> padded Detections in
        canvas coordinates (reference YOLO.forward inference branch,
        yolo.py:141-183).

        Uses the lazy-decode postprocess: candidate selection runs on the
        model-dtype scores and boxes are decoded only for selected anchors."""
        from yolort_tpu.ops.nms import (
            batched_postprocess_from_heads,
            batched_postprocess_from_padded_heads,
        )

        # 'auto' resolves OFF: A/B-measured slower than the default path on
        # v5e (see the head_pad field comment); True forces it on
        use_pad = self.head_pad is True
        if use_pad:
            feats = self.features(params, images)
            outs = self.head.padded_call(params["head"], feats)
            return batched_postprocess_from_padded_heads(
                outs,
                self.strides,
                self.anchor_grids,
                num_classes=self.num_classes,
                score_thresh=self.score_thresh,
                nms_thresh=self.nms_thresh,
                detections_per_img=self.detections_per_img,
                pre_nms_topk=self.pre_nms_topk,
                pre_nms_anchors=self.pre_nms_anchors,
                nms_tile_size=self.nms_tile_size,
                nms_impl=self.nms_impl,
            )

        outs = self.head_outputs(params, images)
        return batched_postprocess_from_heads(
            outs,
            self.strides,
            self.anchor_grids,
            num_classes=self.num_classes,
            score_thresh=self.score_thresh,
            nms_thresh=self.nms_thresh,
            detections_per_img=self.detections_per_img,
            pre_nms_topk=self.pre_nms_topk,
            pre_nms_anchors=self.pre_nms_anchors,
            nms_tile_size=self.nms_tile_size,
            nms_impl=self.nms_impl,
            classes_per_anchor=self.classes_per_anchor,
            selection=self.selection,
        )

    def with_thresholds(self, score_thresh=None, nms_thresh=None, detections_per_img=None,
                        pre_nms_topk=None) -> "YOLO":
        kw = {}
        if score_thresh is not None:
            kw["score_thresh"] = score_thresh
        if nms_thresh is not None:
            kw["nms_thresh"] = nms_thresh
        if detections_per_img is not None:
            kw["detections_per_img"] = detections_per_img
        if pre_nms_topk is not None:
            kw["pre_nms_topk"] = pre_nms_topk
        return replace(self, **kw)


# ---------------------------------------------------------------------------
# architecture registry (mirrors reference yolort/models/yolo.py factories)
# ---------------------------------------------------------------------------

_SIZES = {"n": (0.33, 0.25), "s": (0.33, 0.5), "m": (0.67, 0.75), "l": (1.0, 1.0), "x": (1.33, 1.25)}


def _arch(size: str, version: str, use_p6: bool = False, use_tan: bool = False):
    dm, wm = _SIZES[size]
    def build(num_classes: int = 80, **kwargs) -> YOLO:
        return YOLO(
            depth_multiple=dm,
            width_multiple=wm,
            version=version,
            num_classes=num_classes,
            use_p6=use_p6,
            use_tan=use_tan,
            **kwargs,
        )
    return build


ARCHS = {
    # r3.1 / r4.0 legacy families
    "yolov5_darknet_pan_s_r31": _arch("s", "r3.1"),
    "yolov5_darknet_pan_m_r31": _arch("m", "r3.1"),
    "yolov5_darknet_pan_l_r31": _arch("l", "r3.1"),
    "yolov5_darknet_pan_s_r40": _arch("s", "r4.0"),
    "yolov5_darknet_pan_m_r40": _arch("m", "r4.0"),
    "yolov5_darknet_pan_l_r40": _arch("l", "r4.0"),
    # r6.0
    "yolov5_darknet_pan_n_r60": _arch("n", "r6.0"),
    "yolov5_darknet_pan_s_r60": _arch("s", "r6.0"),
    "yolov5_darknet_pan_m_r60": _arch("m", "r6.0"),
    "yolov5_darknet_pan_l_r60": _arch("l", "r6.0"),
    "yolov5_darknet_pan_x_r60": _arch("x", "r6.0"),
    # P6 @1280
    "yolov5_darknet_pan_n6_r60": _arch("n", "r6.0", use_p6=True),
    "yolov5_darknet_pan_s6_r60": _arch("s", "r6.0", use_p6=True),
    "yolov5_darknet_pan_m6_r60": _arch("m", "r6.0", use_p6=True),
    "yolov5_darknet_pan_l6_r60": _arch("l", "r6.0", use_p6=True),
    "yolov5_darknet_pan_x6_r60": _arch("x", "r6.0", use_p6=True),
    # transformer-attention variant
    "yolov5_darknet_tan_s_r40": _arch("s", "r4.0", use_tan=True),
}


def build_yolo(arch: str, num_classes: int = 80, **kwargs) -> YOLO:
    if arch not in ARCHS:
        raise ValueError(f"Unknown arch '{arch}'. Available: {sorted(ARCHS)}")
    return ARCHS[arch](num_classes=num_classes, **kwargs)
