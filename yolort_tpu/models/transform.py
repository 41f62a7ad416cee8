"""Letterbox pre-processing and inverse coordinate transform, TPU-native.

Re-design of ``yolort/models/transform.py:100`` (YOLOTransform) for XLA's
static-shape compilation model:

  * The resize/pad *plan* (scale, resized size, canvas size, offsets) is pure
    Python over static image shapes — computed at trace time, so the whole
    letterbox lives inside the jitted program as a resize +
    dynamic_update_slice with zero host round-trips.
  * Different raw input shapes produce different specialized executables
    (bucketed static shapes); a numpy/cv2 host path with identical semantics
    (mirroring the reference's runtime/transform.py:12) handles heterogeneous
    eval batches against a fixed-shape compiled graph.

Numerics pinned to the reference:
  * scale = min(min_size/min(h,w), max_size/max(h,w)); resized =
    floor(side * scale)  (torch F.interpolate(scale_factor,
    recompute_scale_factor=True) semantics, transform.py:53-83);
  * canvas = ceil(max_side / size_divisible) * size_divisible or
    ``fixed_shape`` (transform.py:307-314);
  * pad offsets dh/dw = int(round((canvas - resized)/2 - 0.1))
    (transform.py:318-326);
  * fill = 114/255 (transform.py:141).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LetterboxPlan:
    """Static letterbox plan for one raw image size."""

    orig_hw: Tuple[int, int]
    resized_hw: Tuple[int, int]
    canvas_hw: Tuple[int, int]
    offset_hw: Tuple[int, int]


def resize_shape(h: int, w: int, min_size: int, max_size: int) -> Tuple[int, int]:
    scale = min(float(min_size) / min(h, w), float(max_size) / max(h, w))
    return int(math.floor(h * scale)), int(math.floor(w * scale))


def make_plan(
    sizes: Sequence[Tuple[int, int]],
    min_size: int = 640,
    max_size: int = 640,
    size_divisible: int = 32,
    fixed_shape: Optional[Tuple[int, int]] = None,
) -> List[LetterboxPlan]:
    """Compute the batch letterbox plan for a list of raw (h, w) sizes."""
    resized = [resize_shape(h, w, min_size, max_size) for h, w in sizes]
    if fixed_shape is not None:
        canvas = (int(fixed_shape[0]), int(fixed_shape[1]))
    else:
        mh = max(r[0] for r in resized)
        mw = max(r[1] for r in resized)
        s = float(size_divisible)
        canvas = (int(math.ceil(mh / s) * s), int(math.ceil(mw / s) * s))
    plans = []
    for (h, w), (rh, rw) in zip(sizes, resized):
        dh = int(round((canvas[0] - rh) / 2 - 0.1))
        dw = int(round((canvas[1] - rw) / 2 - 0.1))
        plans.append(LetterboxPlan((h, w), (rh, rw), canvas, (dh, dw)))
    return plans


def letterbox_image(image: jax.Array, plan: LetterboxPlan, fill: float = 114.0 / 255.0) -> jax.Array:
    """In-graph letterbox of one (H, W, 3) float image per a static plan.

    Bilinear resize with half-pixel centers (== torch interpolate
    align_corners=False == the reference's _resize_image_and_masks)."""
    rh, rw = plan.resized_hw
    ch, cw = plan.canvas_hw
    dh, dw = plan.offset_hw
    resized = jax.image.resize(
        image, (rh, rw, image.shape[-1]), method="bilinear", antialias=False
    )
    canvas = jnp.full((ch, cw, image.shape[-1]), fill, image.dtype)
    return jax.lax.dynamic_update_slice(canvas, resized.astype(image.dtype), (dh, dw, 0))


def letterbox_batch(images: jax.Array, plan: LetterboxPlan, fill: float = 114.0 / 255.0) -> jax.Array:
    """In-graph letterbox of a same-size raw batch (B, H, W, 3)."""
    b = images.shape[0]
    rh, rw = plan.resized_hw
    ch, cw = plan.canvas_hw
    dh, dw = plan.offset_hw
    resized = jax.image.resize(
        images, (b, rh, rw, images.shape[-1]), method="bilinear", antialias=False
    )
    canvas = jnp.full((b, ch, cw, images.shape[-1]), fill, images.dtype)
    return jax.lax.dynamic_update_slice(canvas, resized.astype(images.dtype), (0, dh, dw, 0))


def letterbox_numpy(
    image: np.ndarray,
    canvas_hw: Tuple[int, int],
    min_size: int = 640,
    max_size: int = 640,
    fill: float = 114.0 / 255.0,
) -> np.ndarray:
    """Host-side letterbox with identical numerics (for heterogeneous eval
    batches feeding a fixed-shape compiled graph; counterpart of the
    reference's numpy YOLOTransform, runtime/transform.py:12)."""
    import cv2

    h, w = image.shape[:2]
    rh, rw = resize_shape(h, w, min_size, max_size)
    resized = cv2.resize(image, (rw, rh), interpolation=cv2.INTER_LINEAR)
    ch, cw = canvas_hw
    dh = int(round((ch - rh) / 2 - 0.1))
    dw = int(round((cw - rw) / 2 - 0.1))
    canvas = np.full((ch, cw, image.shape[-1]), fill, image.dtype)
    canvas[dh : dh + rh, dw : dw + rw] = resized
    return canvas


def scale_coords_back(boxes: jax.Array, canvas_hw: Tuple[int, int], orig_hw) -> jax.Array:
    """Rescale xyxy boxes from the letterboxed canvas to original image
    coordinates (reference transform.py:354-367 — gain/pad recomputed from
    sizes, no rounding)."""
    ch, cw = float(canvas_hw[0]), float(canvas_hw[1])
    oh = orig_hw[..., 0]
    ow = orig_hw[..., 1]
    gain = jnp.minimum(ch / oh, cw / ow)
    pad_x = (cw - ow * gain) * 0.5
    pad_y = (ch - oh * gain) * 0.5
    x1 = (boxes[..., 0] - pad_x) / gain
    y1 = (boxes[..., 1] - pad_y) / gain
    x2 = (boxes[..., 2] - pad_x) / gain
    y2 = (boxes[..., 3] - pad_y) / gain
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def normalize_boxes_to_cxcywh(boxes: jax.Array, orig_hw) -> jax.Array:
    """xyxy pixels -> normalized cxcywh (training target prep,
    reference transform.py:370-381)."""
    h = orig_hw[..., 0]
    w = orig_hw[..., 1]
    x1, y1, x2, y2 = boxes[..., 0] / w, boxes[..., 1] / h, boxes[..., 2] / w, boxes[..., 3] / h
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)
