"""YOLO detection head + anchor generation, TPU-native.

Re-design of ``yolort/models/box_head.py:14`` (YOLOHead) and
``yolort/models/anchor_utils.py:9`` (AnchorGenerator).

TPU-first differences from the reference:
  * head outputs stay NHWC: each level yields (N, H, W, A*(5+nc)) and is
    reshaped to (N, H*W*A, 5+nc) only for decode — no NCHW permutes.
  * anchor grids/shifts are precomputed per static feature shape at trace
    time as constants folded by XLA (the reference regenerates them each
    forward on device, anchor_utils.py:62).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolort_tpu.ops.blocks import Conv2dOnly, Params

# COCO defaults (reference: yolort/models/yolo.py:92-99)
DEFAULT_STRIDES = (8, 16, 32)
DEFAULT_ANCHOR_GRIDS = (
    (10, 13, 16, 30, 33, 23),
    (30, 61, 62, 45, 59, 119),
    (116, 90, 156, 198, 373, 326),
)
# P6 defaults (reference: yolort/models/yolo.py:641-647)
P6_STRIDES = (8, 16, 32, 64)
P6_ANCHOR_GRIDS = (
    (19, 27, 44, 40, 38, 94),
    (96, 68, 86, 152, 180, 137),
    (140, 301, 303, 264, 238, 542),
    (436, 615, 739, 380, 925, 792),
)


@dataclass(frozen=True)
class YOLOHead:
    """Per-level 1x1 conv producing A*(5+nc) channels (box_head.py:14)."""

    in_channels: Tuple[int, ...]
    num_anchors: int
    strides: Tuple[int, ...]
    num_classes: int

    @property
    def num_outputs(self) -> int:
        return self.num_classes + 5

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.in_channels))
        out = {}
        for i, (ch, s, k) in enumerate(zip(self.in_channels, self.strides, keys)):
            conv = Conv2dOnly(ch, self.num_outputs * self.num_anchors, 1, bias=True)
            p = conv.init(k)
            # Prior-probability bias init (box_head.py:40-46):
            # obj: log(8 objects / (640/s)^2 cells); cls: log(0.6/(nc-1)).
            b = np.array(p["b"], np.float32, copy=True).reshape(self.num_anchors, self.num_outputs)
            b[:, 4] += math.log(8 / (640 / s) ** 2)
            b[:, 5:] += math.log(0.6 / (self.num_classes - 0.999999))
            p["b"] = jnp.asarray(b.reshape(-1))
            out[str(i)] = p
        return out

    def __call__(self, p: Params, feats: Sequence[jax.Array]) -> List[jax.Array]:
        """Returns per-level logits (N, H, W, A*(5+nc)), NHWC."""
        outs = []
        for i, (ch, x) in enumerate(zip(self.in_channels, feats)):
            conv = Conv2dOnly(ch, self.num_outputs * self.num_anchors, 1, bias=True)
            outs.append(conv(p[str(i)], x))
        return outs


def head_logits_to_nahwk(logits: jax.Array, num_anchors: int) -> jax.Array:
    """(N,H,W,A*K) -> (N,A,H,W,K), the reference's head layout
    (box_head.py:74-78), used by tests and the loss."""
    n, h, w, _ = logits.shape
    x = logits.reshape(n, h, w, num_anchors, -1)
    return x.transpose(0, 3, 1, 2, 4)


def make_grids_and_shifts(
    grid_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    anchor_grids: Sequence[Sequence[float]],
    dtype=jnp.float32,
) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Anchor center grids and wh shifts per level.

    Matches AnchorGenerator._generate_grids/_generate_shifts
    (anchor_utils.py:19,39) but emits flattened (H*W*A, 2) arrays ordered to
    match the NHWA flattening of head outputs.
    """
    num_anchors = len(anchor_grids[0]) // 2
    grids, shifts = [], []
    for (h, w), stride, ag in zip(grid_sizes, strides, anchor_grids):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xs, ys], axis=-1).astype(np.float32)  # (H, W, 2)
        grid = np.broadcast_to(grid[:, :, None, :], (h, w, num_anchors, 2))
        anchors = np.asarray(ag, np.float32).reshape(num_anchors, 2)  # already in px
        shift = np.broadcast_to(anchors[None, None], (h, w, num_anchors, 2))
        grids.append(jnp.asarray(grid.reshape(-1, 2), dtype))
        shifts.append(jnp.asarray(shift.reshape(-1, 2), dtype))
    return grids, shifts


def decode_level(
    head_logits: jax.Array,
    grid: jax.Array,
    shift: jax.Array,
    stride: float,
    num_anchors: int,
) -> jax.Array:
    """sigmoid + box decode for one level.

    (N,H,W,A*K) -> (N, H*W*A, K) with columns [cx, cy, w, h, obj, cls...].
    Decode math from _utils.decode_single (reference _utils.py:43):
      xy = (2*sig - 0.5 + grid) * stride ; wh = (2*sig)^2 * anchor_wh
    """
    n, h, w, _ = head_logits.shape
    k = head_logits.shape[-1] // num_anchors
    x = head_logits.reshape(n, h * w * num_anchors, k)
    sig = jax.nn.sigmoid(x.astype(jnp.float32))
    xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (sig[..., 2:4] * 2.0) ** 2 * shift
    return jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)


def flatten_heads(head_outputs: Sequence[jax.Array], num_anchors: int) -> jax.Array:
    """Concat per-level logits (B,H,W,A*K) -> (B, total_anchors, K), keeping
    the model dtype (no decode, no upcast)."""
    outs = []
    for ho in head_outputs:
        n, h, w, c = ho.shape
        outs.append(ho.reshape(n, h * w * num_anchors, c // num_anchors))
    return jnp.concatenate(outs, axis=1)


def anchor_tables(
    grid_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    anchor_grids: Sequence[Sequence[float]],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Concatenated per-anchor (grid_xy, anchor_wh, stride) constants, each
    (total_anchors, ...) aligned with flatten_heads ordering."""
    grids, shifts = make_grids_and_shifts(grid_sizes, strides, anchor_grids)
    num_anchors = len(anchor_grids[0]) // 2
    stride_vecs = [
        jnp.full((h * w * num_anchors,), float(s), jnp.float32)
        for (h, w), s in zip(grid_sizes, strides)
    ]
    return (
        jnp.concatenate(grids, axis=0),
        jnp.concatenate(shifts, axis=0),
        jnp.concatenate(stride_vecs, axis=0),
    )


def concat_pred_logits(
    head_outputs: Sequence[jax.Array],
    grid_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    anchor_grids: Sequence[Sequence[float]],
) -> jax.Array:
    """All levels decoded + concatenated: (N, total_anchors, 5+nc).

    Equivalent of _concat_pred_logits (box_head.py:328)."""
    num_anchors = len(anchor_grids[0]) // 2
    grids, shifts = make_grids_and_shifts(grid_sizes, strides, anchor_grids)
    outs = [
        decode_level(ho, g, s, float(st), num_anchors)
        for ho, g, s, st in zip(head_outputs, grids, shifts, strides)
    ]
    return jnp.concatenate(outs, axis=1)
