"""Test-time augmentation (TTA) inference.

Capability parity with the reference's TTA support (scale_img,
v5/utils/torch_utils.py:288, used by ultralytics' augmented inference):
run the model at multiple scales and a horizontal flip, map all decoded
predictions back to the base frame, and NMS the pooled set — all inside one
jit program (each scale is its own static shape, traced together).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import Detections, batched_postprocess


def scale_img(x: jax.Array, ratio: float, stride: int = 32, fill: float = 114.0 / 255.0):
    """Resize a (B,H,W,C) batch by ``ratio`` and pad up to stride-divisible
    dims (the scale_img contract, torch_utils.py:288) — NHWC, static."""
    b, h, w, c = x.shape
    if ratio == 1.0:
        return x
    nh, nw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (b, nh, nw, c), method="bilinear", antialias=False)
    ph = -nh % stride
    pw = -nw % stride
    return jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=fill)


def tta_inference(
    model,
    params,
    images: jax.Array,
    *,
    scales: Sequence[float] = (1.0, 0.83, 0.67),
    flips: Sequence[bool] = (False, True, False),
) -> Detections:
    """Augmented inference over (scale, hflip) variants (ultralytics TTA
    default triple).  images: (B, H, W, 3) letterboxed.  Returns pooled
    Detections in the base frame."""
    b, h, w, _ = images.shape
    preds = []
    for ratio, flip in zip(scales, flips):
        x = images[:, :, ::-1, :] if flip else images
        x = scale_img(x, ratio)
        pred = model.decode(params, x)  # (B, Na_s, 5+nc) in scaled-frame px
        cx, cy, bw, bh = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
        # undo scale
        cx, cy, bw, bh = cx / ratio, cy / ratio, bw / ratio, bh / ratio
        if flip:
            cx = w - cx
        pred = jnp.concatenate(
            [jnp.stack([cx, cy, bw, bh], axis=-1), pred[..., 4:]], axis=-1
        )
        preds.append(pred)

    pooled = jnp.concatenate(preds, axis=1)
    return batched_postprocess(
        pooled,
        num_classes=model.num_classes,
        score_thresh=model.score_thresh,
        nms_thresh=model.nms_thresh,
        detections_per_img=model.detections_per_img,
        pre_nms_topk=model.pre_nms_topk,
        nms_tile_size=model.nms_tile_size,
        nms_impl=model.nms_impl,
    )
