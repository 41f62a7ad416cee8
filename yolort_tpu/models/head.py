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

# Bias value for lane-padding channels of the padded head (see
# pad_head_level_params): sigmoid(-1e4) == 0 in every float dtype, so pad
# lanes can never score above threshold even if a consumer forgets to mask.
PAD_LOGIT = -1.0e4


def padded_num_outputs(num_outputs: int, lane: int = 128) -> int:
    """Smallest lane-multiple >= num_outputs (85 -> 128 for nc=80)."""
    return -(-num_outputs // lane) * lane


def pad_head_level_params(
    p: Params, num_anchors: int, num_outputs: int, kp: int
) -> Params:
    """Pad one level's head-conv params from A*num_outputs to A*kp output
    channels (zero weights, PAD_LOGIT bias), interleaved per anchor so the
    padded output reshapes to (..., A, kp) with lanes [num_outputs:kp] dead.

    Why (hypothesis): with kp a multiple of 128 the (B,H,W,A*kp) ->
    (B,H*W*A,kp) flatten stays lane-aligned and stage-1 reductions run
    full-lane, vs the 85-wide minor dim's lane-crossing relayouts.
    MEASURED OUTCOME on v5e: net slower e2e than the unpadded path (the
    wider head convs and the sublane-interleaving reshape outweigh the
    stage-1 win; docs/PERF.md "Negative results") — kept as a tested
    option via YOLO(head_pad=True).  Works for both the float
    ('w') and int8-compute ('wq'/'ws'/'xs') parameterizations: zero int8
    weights contribute 0 to the s32 accumulator, so pad lanes still come out
    as exactly PAD_LOGIT after the epilogue."""
    pad = kp - num_outputs
    if pad == 0:
        return p

    def padw(w):
        kh, kw, ci, _ = w.shape
        w5 = w.reshape(kh, kw, ci, num_anchors, num_outputs)
        w5 = jnp.pad(w5, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        return w5.reshape(kh, kw, ci, num_anchors * kp)

    out: Params = {}
    if "wq" in p:
        if "os" in p:
            raise ValueError("padded head requires a float-output conv (no 'os')")
        out["wq"] = padw(p["wq"])
        ws = p["ws"].reshape(num_anchors, num_outputs)
        out["ws"] = jnp.pad(ws, ((0, 0), (0, pad)), constant_values=1.0).reshape(-1)
        out["xs"] = p["xs"]
    else:
        out["w"] = padw(p["w"])
    b = p.get("b")
    if b is None:
        b = jnp.zeros((num_anchors * num_outputs,), jnp.float32)
    b = b.reshape(num_anchors, num_outputs)
    out["b"] = jnp.pad(
        b, ((0, 0), (0, pad)), constant_values=jnp.asarray(PAD_LOGIT, b.dtype)
    ).reshape(-1)
    return out


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

    def padded_call(
        self, p: Params, feats: Sequence[jax.Array], lane: int = 128
    ) -> List[jax.Array]:
        """Per-level logits padded to (N, H, W, A*kp) with kp the smallest
        lane multiple >= 5+nc.  Pad lanes carry exactly PAD_LOGIT (zero
        weights + PAD_LOGIT bias), and the A*kp channel layout makes the
        downstream (B,H,W,A*kp) -> (B,H*W*A,kp) flatten lane-aligned —
        see pad_head_level_params.  Same params pytree as __call__."""
        kp = padded_num_outputs(self.num_outputs, lane)
        outs = []
        for i, (ch, x) in enumerate(zip(self.in_channels, feats)):
            conv = Conv2dOnly(ch, kp * self.num_anchors, 1, bias=True)
            pp = pad_head_level_params(p[str(i)], self.num_anchors, self.num_outputs, kp)
            outs.append(conv(pp, x))
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


def anchor_props_from_index(
    idx: jax.Array,
    grid_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    anchor_grids: Sequence[Sequence[float]],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(grid_xy, anchor_wh, stride) for flat anchor indices, computed
    arithmetically instead of gathered from the anchor_tables constants.

    The flatten_heads ordering is index = offset_l + (h*W_l + w)*A + a, so
    every property is pure integer arithmetic on the index — a handful of
    VPU ops on the (k,) index vector, replacing three latency-bound k-row
    gathers (~21 ns/row each on XLA's TPU gather).  Bit-identical to
    indexing the anchor_tables arrays (grid coords are small exact ints,
    anchor/stride values are the same float constants)."""
    num_anchors = len(anchor_grids[0]) // 2
    f32 = jnp.float32
    gx = jnp.zeros(idx.shape, f32)
    gy = jnp.zeros(idx.shape, f32)
    sw = jnp.zeros(idx.shape, f32)
    sh = jnp.zeros(idx.shape, f32)
    st = jnp.zeros(idx.shape, f32)
    off = 0
    for lvl, ((h, w), stride_l, ag) in enumerate(zip(grid_sizes, strides, anchor_grids)):
        n_l = h * w * num_anchors
        in_l = (idx >= off) & (idx < off + n_l)
        local = idx - off
        a = local % num_anchors
        cell = local // num_anchors
        wx = cell % w
        hy = cell // w
        gx = jnp.where(in_l, wx.astype(f32), gx)
        gy = jnp.where(in_l, hy.astype(f32), gy)
        st = jnp.where(in_l, jnp.float32(stride_l), st)
        for ai in range(num_anchors):
            m = in_l & (a == ai)
            sw = jnp.where(m, jnp.float32(ag[2 * ai]), sw)
            sh = jnp.where(m, jnp.float32(ag[2 * ai + 1]), sh)
        off += n_l
    return jnp.stack([gx, gy], axis=-1), jnp.stack([sw, sh], axis=-1), st


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
