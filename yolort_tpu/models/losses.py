"""YOLOv5 training loss, fixed-shape for XLA.

Re-design of ``SetCriterion`` (reference yolort/models/box_head.py:85) and its
``build_targets`` (:233).  The reference's data-dependent gather/filter
pipeline (boolean indexing, variable candidate counts) cannot trace under
jit; here every stage is a *masked fixed-shape* computation, and — unlike the
reference's flat (ΣN, 6) target tensor — targets are laid out **per image**
as (B, T, 5) so the whole loss is batch-major and shards cleanly over a
'data' mesh axis with zero cross-shard gathers.

Semantics pinned to the reference:
  * anchor match: max(r, 1/r).max(-1) < anchor_thresh  (box_head.py:277-278)
  * neighbor offsets (0,0),(±1,0),(0,±1) gated on cell-fraction < 0.5 and
    cell coordinate > 1 (box_head.py:251-298)
  * CIoU box loss (yolort/models/_utils.py:65), BCE objectness with
    IoU-valued targets and per-level balance [4.0, 1.0, 0.4, 0.1]
    (box_head.py:127), BCE classification with label smoothing
    (_utils.py:111).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def bbox_ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU between aligned cxcywh boxes (..., 4).

    Matches reference bbox_iou(x1y1x2y2=False) (_utils.py:65-108)."""
    b1x1, b1x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
    b1y1, b1y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
    b2y1, b2y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0
    )
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise binary cross entropy with logits (torch semantics)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def smooth_bce_targets(eps: float = 0.0) -> Tuple[float, float]:
    """(reference _utils.py:111)"""
    return 1.0 - 0.5 * eps, 0.5 * eps


def focal_modulation(logits, targets, gamma: float, alpha: float = 0.25,
                     quality: bool = False):
    """Elementwise focal-loss weight to apply on top of a BCE-with-logits
    loss.  Matches reference FocalLoss (v5/utils/loss.py:37-69:
    alpha_factor * (1 - p_t)**gamma) and QFocalLoss (:72-97:
    alpha_factor * |true - sigmoid(pred)|**gamma)."""
    pred_prob = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    if quality:
        modulating = jnp.abs(targets - pred_prob) ** gamma
    else:
        p_t = targets * pred_prob + (1.0 - targets) * (1.0 - pred_prob)
        modulating = (1.0 - p_t) ** gamma
    return alpha_factor * modulating


def focal_bce_with_logits(logits, targets, gamma: float, alpha: float = 0.25,
                          pos_weight: float = 1.0, quality: bool = False):
    """BCE-with-logits modulated by the (Q)focal factor (elementwise)."""
    return bce_with_logits(logits, targets, pos_weight) * focal_modulation(
        logits, targets, gamma, alpha, quality
    )


def pad_targets(per_image_targets: Sequence[Dict], max_per_image: int):
    """List of {'labels': (n,), 'boxes_cxcywh_norm': (n,4)} dicts ->
    (B, T, 5) [cls, cx, cy, w, h] + (B, T) mask."""
    import numpy as np

    b = len(per_image_targets)
    out = np.zeros((b, max_per_image, 5), np.float32)
    mask = np.zeros((b, max_per_image), bool)
    for i, t in enumerate(per_image_targets):
        n = min(len(t["labels"]), max_per_image)
        out[i, :n, 0] = np.asarray(t["labels"][:n])
        out[i, :n, 1:] = np.asarray(t["boxes_cxcywh_norm"][:n])
        mask[i, :n] = True
    return jnp.asarray(out), jnp.asarray(mask)


@dataclass(frozen=True)
class YOLOLoss:
    """Loss config (defaults from reference box_head.py:103-116 and
    v5/data/hyps/hyp.scratch.yaml)."""

    strides: Tuple[int, ...]
    anchor_grids: Tuple[Tuple[float, ...], ...]
    num_classes: int
    box_gain: float = 0.05
    cls_gain: float = 0.5
    obj_gain: float = 1.0
    cls_pos: float = 1.0
    obj_pos: float = 1.0
    anchor_thresh: float = 4.0
    label_smoothing: float = 0.0
    gr: float = 1.0
    # focal loss (reference v5/utils/loss.py:120-124: fl_gamma>0 wraps the
    # cls and obj BCE in FocalLoss; QFocalLoss is the quality variant)
    fl_gamma: float = 0.0
    fl_alpha: float = 0.25
    use_qfocal: bool = False

    def _bce(self, logits, targets, pos_weight):
        if self.fl_gamma > 0:
            return focal_bce_with_logits(
                logits, targets, self.fl_gamma, self.fl_alpha, pos_weight,
                quality=self.use_qfocal,
            )
        return bce_with_logits(logits, targets, pos_weight)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_grids[0]) // 2

    @property
    def balance(self) -> Tuple[float, ...]:
        return (4.0, 1.0, 0.4, 0.1)[: len(self.strides)]

    def __call__(
        self,
        head_outputs: Sequence[jax.Array],
        targets: jax.Array,
        target_mask: jax.Array,
    ) -> Dict[str, jax.Array]:
        """
        head_outputs: per-level (B, H, W, A*(5+nc)) NHWC logits.
        targets: (B, T, 5) rows [cls, cx, cy, w, h] (boxes normalized to [0,1]).
        target_mask: (B, T) validity.
        Returns {'cls_logits','bbox_regression','objectness'} (box_head.py:227).
        """
        na = self.num_anchors
        nc = self.num_classes
        smooth_pos, smooth_neg = smooth_bce_targets(self.label_smoothing)

        loss_box = 0.0
        loss_obj = 0.0
        loss_cls = 0.0

        bt = targets.shape[0]
        nt = targets.shape[1]
        t_cls = targets[..., 0].astype(jnp.int32)  # (B, T)
        t_xy = targets[..., 1:3]  # (B, T, 2)
        t_wh = targets[..., 3:5]

        for li, (out, stride, ag, bal) in enumerate(
            zip(head_outputs, self.strides, self.anchor_grids, self.balance)
        ):
            b, h, w, _ = out.shape
            k = 5 + nc
            # keep the (B, n, k) table in the head's compute dtype: the f32
            # cast of the FULL table materializes ~1.1 GB at b128@640 as the
            # candidate gather's operand (gathers can't fuse a cast producer)
            # and its backward streams it again around the scatter-add.
            # cast(gather(x)) == gather(cast(x)) elementwise, so casting the
            # 240 gathered rows / the obj lane after extraction is
            # bit-identical in the loss values (grads differ only in the
            # dtype the gather-backward scatter-add accumulates in).
            logits = out.reshape(b, h * w * na, k)
            anchors = jnp.asarray(ag, jnp.float32).reshape(na, 2) / stride  # grid units

            gxy = t_xy * jnp.asarray([w, h], jnp.float32)  # (B, T, 2)
            gwh = t_wh * jnp.asarray([w, h], jnp.float32)

            # anchor-ratio match: (B, T, A)
            r = gwh[:, :, None, :] / anchors[None, None, :, :]
            match = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < self.anchor_thresh
            match = match & target_mask[:, :, None]

            # neighbor-offset gating: (B, T, 5)
            g_bias = 0.5
            fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
            ixf, iyf = (w - gxy[..., 0]) % 1.0, (h - gxy[..., 1]) % 1.0
            off_ok = jnp.stack(
                [
                    jnp.ones_like(fx, bool),
                    (fx < g_bias) & (gxy[..., 0] > 1.0),
                    (fy < g_bias) & (gxy[..., 1] > 1.0),
                    (ixf < g_bias) & ((w - gxy[..., 0]) > 1.0),
                    (iyf < g_bias) & ((h - gxy[..., 1]) > 1.0),
                ],
                axis=-1,
            )
            offsets = (
                jnp.asarray([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], jnp.float32) * g_bias
            )  # (5, 2)

            # dense candidate lattice (B, T, 5, A), flattened to (B, C)
            cand = off_ok[..., :, None] & match[:, :, None, :]  # (B,T,5,A)
            gij = jnp.floor(gxy[:, :, None, :] - offsets[None, None, :, :])  # (B,T,5,2)
            gi = jnp.clip(gij[..., 0].astype(jnp.int32), 0, w - 1)  # (B,T,5)
            gj = jnp.clip(gij[..., 1].astype(jnp.int32), 0, h - 1)

            c = nt * 5 * na
            c_mask = cand.reshape(bt, c)
            a_idx = jnp.broadcast_to(jnp.arange(na)[None, None, None, :], cand.shape)
            gi_b = jnp.broadcast_to(gi[..., None], cand.shape)
            gj_b = jnp.broadcast_to(gj[..., None], cand.shape)
            cell = ((gj_b * w + gi_b) * na + a_idx).reshape(bt, c)  # (B, C)

            c_txy = (
                jnp.broadcast_to(gxy[:, :, None, None, :], cand.shape + (2,))
                - jnp.stack([gi_b, gj_b], axis=-1).astype(jnp.float32)
            ).reshape(bt, c, 2)
            c_twh = jnp.broadcast_to(gwh[:, :, None, None, :], cand.shape + (2,)).reshape(bt, c, 2)
            c_cls = jnp.broadcast_to(t_cls[:, :, None, None], cand.shape).reshape(bt, c)
            c_anchor_wh = anchors[a_idx.reshape(bt, c)]

            # gather predictions at candidate cells (batch-major, no
            # cross-image indexing)
            pred = jnp.take_along_axis(logits, cell[..., None], axis=1).astype(
                jnp.float32
            )  # (B, C, k)
            sig = jax.nn.sigmoid(pred[..., :4])
            pred_xy = sig[..., :2] * 2.0 - 0.5
            pred_wh = (sig[..., 2:4] * 2.0) ** 2 * c_anchor_wh
            pred_box = jnp.concatenate([pred_xy, pred_wh], axis=-1)
            tgt_box = jnp.concatenate([c_txy, c_twh], axis=-1)

            iou = bbox_ciou(pred_box, tgt_box)  # (B, C)
            n_cand = jnp.maximum(jnp.sum(c_mask), 1)
            loss_box = loss_box + jnp.sum(jnp.where(c_mask, 1.0 - iou, 0.0)) / n_cand

            # objectness: scatter IoU score into each image's (H*W*A,) grid
            score_iou = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            tobj_val = jnp.where(c_mask, (1.0 - self.gr) + self.gr * score_iou, 0.0)
            drop_cell = jnp.where(c_mask, cell, h * w * na)

            def scatter_one(idx, val):
                return jnp.zeros((h * w * na,), jnp.float32).at[idx].set(val, mode="drop")

            tobj = jax.vmap(scatter_one)(drop_cell, tobj_val)  # (B, H*W*A)
            loss_obj_l = jnp.mean(
                self._bce(logits[..., 4].astype(jnp.float32), tobj, self.obj_pos)
            )
            loss_obj = loss_obj + loss_obj_l * bal

            # classification over candidate subset
            if nc > 1:
                onehot = jax.nn.one_hot(c_cls, nc, dtype=jnp.float32)
                t = smooth_neg + (smooth_pos - smooth_neg) * onehot
                cls_bce = self._bce(pred[..., 5:], t, self.cls_pos)
                loss_cls = loss_cls + jnp.sum(
                    jnp.where(c_mask[..., None], cls_bce, 0.0)
                ) / (n_cand * nc)

        return {
            "cls_logits": loss_cls * self.cls_gain,
            "bbox_regression": loss_box * self.box_gain,
            "objectness": loss_obj * self.obj_gain,
        }
