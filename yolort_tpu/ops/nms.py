"""Fixed-shape batched NMS for TPU.

The reference runs a per-image Python loop calling torchvision's CUDA/CPU
``batched_nms`` (yolort/models/box_head.py:414-427, semantics also pinned by
the hand-rolled C version in deployment/ncnn/main.cpp:87-161).  That shape-
dynamic pattern cannot live inside one XLA program, so this module re-designs
it TPU-first:

  1. candidate selection = top-K over the flattened (anchor, class) score
     matrix with sub-threshold entries masked out — a fixed-shape superset of
     the reference's ``torch.where(scores > score_thresh)``;
  2. class-aware NMS via the coordinate-offset trick (torchvision
     ``batched_nms`` / reference v5/utils/general.py:601);
  3. greedy suppression as a *tiled fixed-point iteration*: for each tile of
     candidates (already finalized tiles act as suppressors), iterate
     ``alive -> valid & ~any(sup & alive)`` to convergence.  Because the
     suppression matrix is strictly upper-triangular in score order, the
     iteration converges to exactly the sequential-greedy result (earlier
     indices stabilize first and never flip back).

Everything is fixed-shape: outputs are padded to ``detections_per_img`` with
a validity mask, mirroring the EfficientNMS_TRT contract the reference uses
for TensorRT (relay/trt_graphsurgeon.py:223-244).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def box_area(b):
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)


def box_iou_matrix(a, b):
    """Pairwise IoU, xyxy. a: (M,4), b: (N,4) -> (M,N).

    Matches torchvision.ops.box_iou (no +1 correction)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def cxcywh_to_xyxy(box):
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def _self_suppress(sup: jax.Array, valid: jax.Array) -> jax.Array:
    """Greedy NMS inside one tile via fixed-point iteration.

    sup: (T,T) bool, sup[i,j] True iff box i suppresses box j (iou>thr and
    i<j in score order). valid: (T,) candidate validity. Returns alive mask
    equal to the sequential greedy scan result.
    """

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        alive, _ = state
        suppressed = jnp.any(sup & alive[:, None], axis=0)
        new_alive = valid & ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return alive


def greedy_nms_mask(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile_size: int = 256,
) -> jax.Array:
    """Greedy NMS keep-mask over score-sorted candidates.

    boxes: (K,4) xyxy sorted by descending score; valid: (K,) bool.
    Returns keep: (K,) bool — identical to sequential greedy NMS with strict
    ``iou > iou_thresh`` suppression (torchvision.ops.nms semantics).
    """
    k = boxes.shape[0]
    t = min(tile_size, k)
    if k % t != 0:
        pad = t - k % t
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    kp = boxes.shape[0]
    num_tiles = kp // t
    idx = jnp.arange(kp)

    def tile_body(i, alive):
        start = i * t
        tile_boxes = jax.lax.dynamic_slice(boxes, (start, 0), (t, 4))
        tile_valid = jax.lax.dynamic_slice(valid, (start,), (t,))
        iou = box_iou_matrix(tile_boxes, boxes)  # (T, Kp)
        # suppression by finalized earlier tiles
        prev = alive & (idx < start)
        sup_prev = jnp.any((iou > iou_thresh) & prev[None, :], axis=1)
        tile_valid = tile_valid & ~sup_prev
        # within-tile greedy
        iou_tt = jax.lax.dynamic_slice(iou, (0, start), (t, t))
        tri = jnp.arange(t)[:, None] < jnp.arange(t)[None, :]  # i suppresses j>i
        sup_tt = (iou_tt > iou_thresh) & tri
        tile_alive = _self_suppress(sup_tt, tile_valid)
        return jax.lax.dynamic_update_slice(alive, tile_alive, (start,))

    alive = jax.lax.fori_loop(0, num_tiles, tile_body, valid)
    return alive[:k]


def nms_keep_mask(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile_size: int = 256,
    impl: str = "auto",
) -> jax.Array:
    """Dispatch greedy NMS to the Pallas TPU kernel or the XLA fallback.

    impl: 'auto' (Pallas on TPU, XLA elsewhere) | 'pallas' | 'xla'."""
    if impl != "xla":
        from yolort_tpu.ops.pallas.nms_kernel import pallas_nms_available, pallas_nms_mask

        k = boxes.shape[0]
        if impl == "pallas" or (pallas_nms_available() and k % tile_size == 0):
            return pallas_nms_mask(boxes, valid, iou_thresh, tile=tile_size)
    return greedy_nms_mask(boxes, valid, iou_thresh, tile_size=tile_size)


class Detections(NamedTuple):
    """Padded, fixed-shape detection results (per image or batched)."""

    boxes: jax.Array  # (..., D, 4) xyxy
    scores: jax.Array  # (..., D)
    labels: jax.Array  # (..., D) int32
    valid: jax.Array  # (..., D) bool
    num: jax.Array  # (...,) int32


def _single_image_nms(
    pred: jax.Array,
    *,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "topk",  # 'topk' | 'sort' (libtpu TopK-emitter workaround)
) -> Detections:
    """pred: (Na, 5+nc) decoded [cx,cy,w,h,obj,cls...] for ONE image.

    Candidate selection is two-stage to keep top_k off the full (Na*nc)
    score matrix (a 25200*80=2M-element sort dominates the whole pipeline on
    TPU): first the top ``pre_nms_anchors`` anchors by best-class score,
    then the top ``pre_nms_topk`` (anchor, class) pairs among those.  Exact
    whenever every surviving pair's anchor ranks within pre_nms_anchors by
    max score — guaranteed when pre_nms_anchors >= pre_nms_topk since each
    anchor contributes >= 1 pair at least as large as any of its pairs.
    """
    boxes_all = cxcywh_to_xyxy(pred[:, :4])
    scores_all = pred[:, 5:] * pred[:, 4:5]  # obj * cls (box_head.py:357)

    na = pred.shape[0]
    k = min(pre_nms_topk, na * num_classes)
    # k1 >= k makes the two-stage selection exact (see docstring).  The +8
    # sidesteps a libtpu TopK-emitter crash on the exact shape
    # (1, nc*k) with k=4096 (TransformWindow check failure in fusion_util).
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    def select_topk(values, kk):
        if topk_impl == "sort":
            # sort-based selection: the libtpu TopK emitter miscompiles some
            # batch-1 fused shapes (fusion_util.cc TransformWindow /
            # pipeline_emitter.cc span_size aborts); full argsort uses the
            # (solid) sort emitter instead.
            order = jnp.argsort(-values)
            idx = order[:kk]
            return values[idx], idx
        return jax.lax.top_k(values, kk)

    # stage 1: best-class score per anchor, top-k1 anchors
    per_anchor = jnp.max(scores_all, axis=-1)
    _, anchor_sel = select_topk(per_anchor, k1)  # (k1,)
    sel_scores = scores_all[anchor_sel]  # (k1, nc)

    # stage 2: top-k (anchor, class) pairs among selected anchors
    flat = sel_scores.reshape(-1)
    flat = jnp.where(flat > score_thresh, flat, -1.0)
    top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes))
    anchor_idx = anchor_sel[top_idx // num_classes]
    labels = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = boxes_all[anchor_idx]
    valid = top_scores > score_thresh

    # class offset — torchvision _batched_nms_coordinate_trick semantics
    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (labels.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]

    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size, impl=nms_impl)

    # compact kept candidates (already score-ordered) into D padded slots
    d = detections_per_img
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < d), rank, d)  # d == drop
    out_boxes = jnp.zeros((d, 4), cand_boxes.dtype).at[slot].set(cand_boxes, mode="drop")
    out_scores = jnp.zeros((d,), top_scores.dtype).at[slot].set(top_scores, mode="drop")
    out_labels = jnp.zeros((d,), jnp.int32).at[slot].set(labels, mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), d)
    out_valid = jnp.arange(d) < num
    return Detections(out_boxes, out_scores, out_labels, out_valid, num)


def _single_image_nms_from_logits(
    logits: jax.Array,
    grid: jax.Array,
    shift: jax.Array,
    stride: jax.Array,
    *,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int],
    nms_tile_size: int,
    nms_impl: str,
    topk_impl: str,
    classes_per_anchor: Optional[int] = None,
) -> Detections:
    """Lazy-decode postprocess for ONE image.

    logits: (Na, 5+nc) raw head logits in model dtype (e.g. bf16); grid /
    shift: (Na, 2); stride: (Na,).  Candidate *selection* runs on the cheap
    low-precision scores; boxes and exact f32 scores are computed only for
    the <= k1 selected anchors — the (Na, 4) fp32 box materialization the
    eager path pays (reference decodes everything up front,
    box_head.py:328-348) never happens.
    """
    na = logits.shape[0]
    k = min(pre_nms_topk, na * num_classes)
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    def select_topk(values, kk):
        if topk_impl == "sort":
            order = jnp.argsort(-values)
            idx = order[:kk]
            return values[idx], idx
        return jax.lax.top_k(values, kk)

    # stage 1 on model-dtype scores (selection only; exact scores recomputed
    # in f32 on the selected subset below)
    obj = jax.nn.sigmoid(logits[:, 4])
    cls = jax.nn.sigmoid(logits[:, 5:])
    per_anchor = jnp.max(cls, axis=-1) * obj
    _, anchor_sel = select_topk(per_anchor.astype(jnp.float32), k1)

    sel_logits = logits[anchor_sel].astype(jnp.float32)  # (k1, 5+nc)
    sel_sig = jax.nn.sigmoid(sel_logits)
    sel_scores = sel_sig[:, 5:] * sel_sig[:, 4:5]  # (k1, nc) f32

    # decode boxes for selected anchors only (reference decode math,
    # _utils.py:43)
    g = grid[anchor_sel]
    s = shift[anchor_sel]
    st = stride[anchor_sel][:, None]
    xy = (sel_sig[:, 0:2] * 2.0 - 0.5 + g) * st
    wh = (sel_sig[:, 2:4] * 2.0) ** 2 * s
    sel_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))  # (k1, 4)

    # stage 2: top-k (anchor, class) pairs.  classes_per_anchor restricts
    # each anchor to its best C classes first, shrinking the sort domain
    # nc/C-fold (multi-label anchors rarely carry >2-3 above-threshold
    # classes in practice; None = exact multi-label semantics).
    if classes_per_anchor is not None and classes_per_anchor < num_classes:
        cpa = classes_per_anchor
        class_vals, class_idx = jax.lax.top_k(sel_scores, cpa)  # (k1, cpa)
        flat = class_vals.reshape(-1)
        flat = jnp.where(flat > score_thresh, flat, -1.0)
        top_scores, top_idx = select_topk(flat, min(k, k1 * cpa))
        row = top_idx // cpa
        labels = class_idx.reshape(-1)[top_idx].astype(jnp.int32)
    else:
        flat = sel_scores.reshape(-1)
        flat = jnp.where(flat > score_thresh, flat, -1.0)
        top_scores, top_idx = select_topk(flat, min(k, k1 * num_classes))
        row = top_idx // num_classes
        labels = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = sel_boxes[row]
    valid = top_scores > score_thresh

    max_coord = jnp.max(jnp.where(valid[:, None], cand_boxes, 0.0))
    offset_boxes = cand_boxes + (labels.astype(cand_boxes.dtype) * (max_coord + 1.0))[:, None]
    keep = nms_keep_mask(offset_boxes, valid, nms_thresh, tile_size=nms_tile_size, impl=nms_impl)

    d = detections_per_img
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < d), rank, d)
    out_boxes = jnp.zeros((d, 4), cand_boxes.dtype).at[slot].set(cand_boxes, mode="drop")
    out_scores = jnp.zeros((d,), top_scores.dtype).at[slot].set(top_scores, mode="drop")
    out_labels = jnp.zeros((d,), jnp.int32).at[slot].set(labels, mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), d)
    return Detections(out_boxes, out_scores, out_labels, jnp.arange(d) < num, num)


def batched_postprocess_from_heads(
    head_outputs,
    strides,
    anchor_grids,
    *,
    num_classes: int,
    score_thresh: float = 0.005,
    nms_thresh: float = 0.45,
    detections_per_img: int = 300,
    pre_nms_topk: int = 4096,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "auto",
    classes_per_anchor: Optional[int] = None,
) -> Detections:
    """Lazy-decode batched postprocess from raw per-level head logits."""
    from yolort_tpu.models.head import anchor_tables, flatten_heads

    num_anchors = len(anchor_grids[0]) // 2
    grid_sizes = [o.shape[1:3] for o in head_outputs]
    logits = flatten_heads(head_outputs, num_anchors)  # (B, Na, K)
    grid, shift, stride = anchor_tables(grid_sizes, strides, anchor_grids)

    if topk_impl == "auto":
        small_batch = logits.shape[0] < 4
        on_tpu = jax.default_backend() not in ("cpu",)
        topk_impl = "sort" if (small_batch and on_tpu) else "topk"

    fn = partial(
        _single_image_nms_from_logits,
        num_classes=num_classes,
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        topk_impl=topk_impl,
        classes_per_anchor=classes_per_anchor,
    )
    return jax.vmap(fn, in_axes=(0, None, None, None))(logits, grid, shift, stride)


def batched_postprocess(
    pred_logits: jax.Array,
    *,
    num_classes: int,
    score_thresh: float = 0.005,
    nms_thresh: float = 0.45,
    detections_per_img: int = 300,
    pre_nms_topk: int = 4096,
    pre_nms_anchors: Optional[int] = None,
    nms_tile_size: int = 256,
    nms_impl: str = "auto",
    topk_impl: str = "auto",
) -> Detections:
    """Batched in-graph NMS postprocess.

    pred_logits: (B, Na, 5+nc) decoded predictions (from
    models.head.concat_pred_logits). Returns batched padded Detections.

    Equivalent of the reference PostProcess.forward per-image loop
    (box_head.py:388-429), fully vectorized via vmap.

    topk_impl='auto' uses sort-based selection for small batches on TPU
    (the libtpu TopK emitter aborts on some batch-1 fused shapes) and
    lax.top_k otherwise.
    """
    if topk_impl == "auto":
        small_batch = pred_logits.shape[0] < 4
        on_tpu = jax.default_backend() not in ("cpu",)
        topk_impl = "sort" if (small_batch and on_tpu) else "topk"
    fn = partial(
        _single_image_nms,
        num_classes=num_classes,
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        topk_impl=topk_impl,
    )
    return jax.vmap(fn)(pred_logits)
