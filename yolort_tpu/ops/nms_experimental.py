"""MEASURED-NEGATIVE postprocess paths, kept importable for re-measurement.

Both paths here are functionally identical to the production paths in
ops/nms.py (reference semantics: yolort/models/box_head.py:388-429) and
LOST their hardware A/B on v5e — numbers + analysis in docs/PERF.md
"Negative results".  Reachable from production code only via explicit
option values (flatten_pad=True / selection='single' / YOLO(head_pad=True))
and re-exported by ops/nms.py's lazy ``__getattr__`` so existing imports
keep working.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import (
    Detections,
    NMSConfig,
    _decode_stage2_nms,
    _nms_and_compact,
    cxcywh_to_xyxy,
)
from yolort_tpu.ops.select import select_topk_indices, select_topk_threshold


def _single_image_nms_padded(
    logits: jax.Array,
    *,
    num_classes: int,
    grid_sizes,
    strides,
    anchor_grids,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_topk: int,
    pre_nms_anchors: Optional[int],
    nms_tile_size: int,
    nms_impl: str,
    payload_boxes: bool = False,
    s1_impl: str = "auto",
    stage2: str = "auto",
    row_gather: str = "auto",
    box_gather: str = "auto",
) -> Detections:
    """Lane-padded lazy-decode postprocess for ONE image.

    MEASURED NEGATIVE RESULT on v5e (kept as a tested option, like the
    Pallas qconv): eval 1580 vs 1723 imgs/s for the default path with
    arithmetic anchor props — the wider head convs, the not-actually-free
    padded flatten, and the w=nc payload selection cost more than the
    lane-aligned stage-1 saves.  See docs/PERF.md "Negative results".

    logits: (Na, kp) raw head logits with kp a 128-lane multiple >= 5+nc —
    produced by YOLOHead.padded_call, whose pad lanes are exactly PAD_LOGIT
    (models/head.py).  Functionally identical to
    ``_single_image_nms_from_logits`` (reference semantics:
    yolort/models/box_head.py:388-429); what changes is the TPU cost model:

      * the (B,H,W,A*kp) -> (Na, kp) flatten upstream stays lane-aligned
        (the 85-wide minor dim pays a lane-crossing relayout instead);
      * stage-1 obj/class-max run as full-lane masked reductions — no
        lane-slice relayouts on the (Na, kp) stream;
      * grid/shift/stride come from index arithmetic
        (head.anchor_props_from_index) instead of three k-row table gathers;
      * stage-2 lays its flat score domain out one-anchor-per-chunk (w = nc)
        and rides the decoded boxes through the selection's own chunk gather
        as payload lanes — the separate cand-boxes k-row gather disappears.
    """
    na, kp = logits.shape
    nc = num_classes
    k = min(pre_nms_topk, na * nc)
    k1 = min(pre_nms_anchors if pre_nms_anchors is not None else k + 8, na)

    # stage 1 on model-dtype scores: masked full-lane reductions (lane iota
    # compares are free on the VPU; slicing lanes 4 / 5:5+nc would relayout)
    lane = jnp.arange(kp, dtype=jnp.int32)
    cls_mask = (lane >= 5) & (lane < 5 + nc)
    neg = jnp.asarray(-1.0e4, logits.dtype)
    obj_logit = jnp.max(jnp.where(lane == 4, logits, neg), axis=-1)
    cls_logit = jnp.max(jnp.where(cls_mask, logits, neg), axis=-1)
    # sigmoid is monotone: max_c sig(obj)*sig(cls_c) == sig(obj)*sig(max_c)
    per_anchor = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)
    if s1_impl == "auto":
        s1_impl = "sortidx"
    if s1_impl == "sortidx":
        # indices-only screen: one single-operand i32 sort replaces the
        # whole stream-compaction (incl. its latency-bound k1-row gather)
        s1_ok, anchor_sel = select_topk_indices(per_anchor.astype(jnp.float32), k1)
    else:
        s1_vals, anchor_sel = select_topk_threshold(
            per_anchor.astype(jnp.float32), k1, 0.0, sort=False
        )
        s1_ok = s1_vals >= 0.0

    sel_logits = logits[anchor_sel].astype(jnp.float32)  # (k1, kp) THE row gather
    sel_sig = jax.nn.sigmoid(sel_logits)
    return _decode_stage2_nms(
        sel_sig, anchor_sel, s1_ok, lane, cls_mask,
        num_classes=num_classes, grid_sizes=grid_sizes, strides=strides,
        anchor_grids=anchor_grids, score_thresh=score_thresh,
        nms_thresh=nms_thresh, detections_per_img=detections_per_img,
        k=k, k1=k1, nms_tile_size=nms_tile_size, nms_impl=nms_impl,
        payload_boxes=payload_boxes, stage2=stage2,
        row_gather=row_gather, box_gather=box_gather,
    )


def _padded_flatten_postprocess(logits: jax.Array, cfg: NMSConfig) -> Detections:
    """flatten_pad=True branch of batched_postprocess_from_heads: pad the
    flattened logits to a 128-lane minor dim AFTER the standard-width head
    convs (PAD_LOGIT lanes can never score above threshold), then run the
    lane-aligned masked-stage-1 path: the padded-head idea without its
    wider-conv cost.  A/B'd on v5e (measured negative; tested option)."""
    from yolort_tpu.models.head import PAD_LOGIT, padded_num_outputs

    kw = cfg.num_classes + 5
    kp = padded_num_outputs(kw)
    if kp != kw:
        logits = jnp.pad(
            logits, ((0, 0), (0, 0), (0, kp - kw)),
            constant_values=jnp.asarray(PAD_LOGIT, logits.dtype),
        )
    fnp = partial(
        _single_image_nms_padded,
        num_classes=cfg.num_classes,
        grid_sizes=cfg.grid_sizes,
        strides=cfg.strides,
        anchor_grids=cfg.anchor_grids,
        score_thresh=cfg.score_thresh,
        nms_thresh=cfg.nms_thresh,
        detections_per_img=cfg.detections_per_img,
        pre_nms_topk=cfg.pre_nms_topk,
        pre_nms_anchors=cfg.pre_nms_anchors,
        nms_tile_size=cfg.nms_tile_size,
        nms_impl=cfg.nms_impl,
        payload_boxes=cfg.payload_boxes,
        s1_impl=cfg.s1_impl,
        stage2=cfg.stage2,
        row_gather=cfg.row_gather,
        box_gather=cfg.box_gather,
    )
    return jax.vmap(fnp)(logits)


def _single_image_nms_single_stage(
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
    nms_tile_size: int,
    nms_impl: str,
) -> Detections:
    """Single-stage full-domain lazy-decode postprocess for ONE image.

    ONE bisect-select over all (Na*nc) bf16 scores replaces the two-stage
    anchor-screen + pair-select, cutting the number of latency-bound k-row
    gathers from four to two.  Measured on v5e at batch 128 it LOSES to the
    two-stage path anyway (119 vs 70 ms eval config): the full-domain
    bisect counting (17 ms over 2M bf16 entries) and the slot->chunk
    lookup/extract (which scale with domain/chunk width) outgrow the two
    gathers removed.  Kept as a tested option (docs/PERF.md "Negative
    results") — its cost model favors small pre_nms_topk over very large
    anchor domains.

    Selection runs on bf16 keys (threshold rounded one ulp down =>
    over-selects); the kept candidates are re-scored in exact f32 from the
    gathered logits rows and re-sorted, so final detections match the
    reference's f32 semantics whenever the above-threshold count fits in
    pre_nms_topk (reference keeps ALL survivors, box_head.py:388-410; the
    k-cap is this fixed-shape design's only approximation, as before).
    """
    na = logits.shape[0]
    nc = num_classes
    k = min(pre_nms_topk, na * nc)

    lg16 = logits.astype(jnp.bfloat16)
    obj = jax.nn.sigmoid(lg16[:, 4:5])
    scores = (jax.nn.sigmoid(lg16[:, 5:]) * obj).reshape(-1)  # (Na*nc,) bf16
    v_sel, idx = select_topk_threshold(scores, k, score_thresh, sort=False, w=1024)

    anchor = idx // nc
    label = (idx % nc).astype(jnp.int32)
    sel_ok = v_sel >= 0.0  # empty slots are -1 (repeated idx-0 must not fabricate)

    rows = logits[anchor].astype(jnp.float32)  # (k, 5+nc) — THE row gather
    sig = jax.nn.sigmoid(rows)
    cls_onehot = label[:, None] == jnp.arange(nc, dtype=jnp.int32)[None, :]
    score = sig[:, 4] * jnp.sum(jnp.where(cls_onehot, sig[:, 5:], 0.0), axis=1)
    valid = sel_ok & (score > score_thresh)  # exact f32 threshold re-applied
    score = jnp.where(valid, score, -1.0)

    # exact-f32 descending order (NMS consumes score-ordered candidates);
    # one multi-operand sort — payload gathers after a sort would cost
    # another latency-bound k-row gather
    neg, anchor, label, sx, sy, sw, sh, ok8 = jax.lax.sort(
        (-score, anchor, label, sig[:, 0], sig[:, 1], sig[:, 2], sig[:, 3],
         valid.astype(jnp.int32)),
        dimension=0, num_keys=1,
    )
    score = -neg
    valid = ok8 > 0

    g = grid[anchor]
    s = shift[anchor]
    st = stride[anchor][:, None]
    xy = (jnp.stack([sx, sy], axis=-1) * 2.0 - 0.5 + g) * st
    wh = (jnp.stack([sw, sh], axis=-1) * 2.0) ** 2 * s
    cand_boxes = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))  # (k, 4)

    return _nms_and_compact(
        cand_boxes, score, label, valid,
        nms_thresh=nms_thresh, detections_per_img=detections_per_img,
        nms_tile_size=nms_tile_size, nms_impl=nms_impl,
    )


def batched_postprocess_from_padded_heads(
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
    payload_boxes: bool = False,
    s1_impl: str = "auto",
    stage2: str = "auto",
) -> Detections:
    """Batched postprocess from lane-padded head logits (YOLOHead.padded_call).

    Masked stage-1 reductions, arithmetic anchor properties, payload-carried
    boxes — see ``_single_image_nms_padded`` (measured negative result on
    v5e; off by default, forced via YOLO(head_pad=True)).  Requires the
    bisect selection machinery (select_topk_threshold)."""
    from yolort_tpu.models.head import flatten_heads

    num_anchors = len(anchor_grids[0]) // 2
    grid_sizes = tuple(tuple(o.shape[1:3]) for o in head_outputs)
    logits = flatten_heads(head_outputs, num_anchors)  # (B, Na, kp) lane-aligned

    fn = partial(
        _single_image_nms_padded,
        num_classes=num_classes,
        grid_sizes=grid_sizes,
        strides=tuple(strides),
        anchor_grids=tuple(tuple(a) for a in anchor_grids),
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        pre_nms_topk=pre_nms_topk,
        pre_nms_anchors=pre_nms_anchors,
        nms_tile_size=nms_tile_size,
        nms_impl=nms_impl,
        payload_boxes=payload_boxes,
        s1_impl=s1_impl,
        stage2=stage2,
    )
    return jax.vmap(fn)(logits)
