"""COCO-style mAP evaluation, dependency-free.

Re-design of the reference's ``COCOEvaluator`` (yolort/data/coco_eval.py:28),
which wraps pycocotools' COCOeval.  pycocotools is not in this image, so the
matching + accumulation algorithm is implemented natively in numpy with
COCOeval-compatible semantics:

  * IoU thresholds 0.50:0.05:0.95, recall thresholds 0:0.01:1 (101-point)
  * greedy per-class matching in score order; each GT used once; crowd GTs
    can absorb unlimited detections but never count as matches
  * area ranges all/small/medium/large, maxDets=100 for AP
  * AP = mean over classes present in GT of interpolated precision

The multi-process shard merge the reference does with pickle all_gather
(data/distributed.py:6 + coco_eval.py:220-243) is replaced by
``yolort_tpu.parallel.distributed.all_gather_objects``.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # 10 thresholds
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def box_iou_xyxy(a: np.ndarray, b: np.ndarray, iscrowd: Optional[np.ndarray] = None):
    """IoU matrix (len(a), len(b)); crowd columns use intersection/area_a
    (pycocotools 'iscrowd' semantics)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    if iscrowd is not None:
        union = np.where(iscrowd[None, :], area_a[:, None], union)
    return inter / np.maximum(union, 1e-12)


class COCOEvaluator:
    """Accumulates per-image predictions + ground truth, computes COCO AP.

    update() takes plain dicts (no pycocotools index structure needed):
      preds:   {'boxes': (N,4) xyxy, 'scores': (N,), 'labels': (N,)}
      targets: {'boxes': (M,4) xyxy, 'labels': (M,),
                'iscrowd': optional (M,), 'area': optional (M,)}
    """

    def __init__(self, num_classes: Optional[int] = None, max_dets: int = 100):
        self.max_dets = max_dets
        self.num_classes = num_classes
        self._preds: List[Dict] = []
        self._targets: List[Dict] = []

    def reset(self):
        self._preds.clear()
        self._targets.clear()

    def update(self, preds: Sequence[Dict], targets: Sequence[Dict]):
        assert len(preds) == len(targets)
        for p, t in zip(preds, targets):
            self._preds.append({k: np.asarray(v) for k, v in p.items()})
            tt = {k: np.asarray(v) for k, v in t.items()}
            m = len(tt["labels"])
            if "iscrowd" not in tt:
                tt["iscrowd"] = np.zeros(m, bool)
            if "area" not in tt:
                b = tt["boxes"].reshape(m, 4) if m else np.zeros((0, 4))
                tt["area"] = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
                    b[:, 3] - b[:, 1], 0, None
                )
            self._targets.append(tt)

    # ------------------------------------------------------------------
    def _match_image(self, pred, tgt, cls, area_rng):
        """Per-(image, class, area-range) greedy matching.

        Returns (det_scores, det_matched(T,), det_ignored, n_gt) where
        det_matched is (T_iou, n_det) bool."""
        lo, hi = area_rng
        sel_d = pred["labels"] == cls
        d_boxes = pred["boxes"].reshape(-1, 4)[sel_d]
        d_scores = pred["scores"][sel_d]
        order = np.argsort(-d_scores, kind="stable")[: self.max_dets]
        d_boxes, d_scores = d_boxes[order], d_scores[order]

        sel_g = tgt["labels"] == cls
        g_boxes = tgt["boxes"].reshape(-1, 4)[sel_g]
        g_crowd = tgt["iscrowd"][sel_g].astype(bool)
        g_area = tgt["area"][sel_g]
        g_ignore = g_crowd | (g_area < lo) | (g_area > hi)
        # sort GT: non-ignored first (pycocotools evaluateImg semantics)
        g_order = np.argsort(g_ignore, kind="stable")
        g_boxes, g_crowd, g_ignore = g_boxes[g_order], g_crowd[g_order], g_ignore[g_order]

        n_d, n_g = len(d_boxes), len(g_boxes)
        n_iou = len(IOU_THRS)
        d_matched = np.zeros((n_iou, n_d), bool)
        d_ignored = np.zeros((n_iou, n_d), bool)
        if n_d and n_g:
            ious = box_iou_xyxy(d_boxes, g_boxes, iscrowd=g_crowd)
            for ti, thr in enumerate(IOU_THRS):
                g_used = np.zeros(n_g, bool)
                for di in range(n_d):
                    best, best_iou = -1, float(thr)
                    for gi in range(n_g):
                        if g_used[gi] and not g_crowd[gi]:
                            continue
                        # prefer non-ignored matches: once matched to a real
                        # GT, don't switch to an ignored one
                        if best > -1 and not g_ignore[best] and g_ignore[gi]:
                            break
                        if ious[di, gi] < best_iou:
                            continue
                        best_iou = ious[di, gi]
                        best = gi
                    if best > -1:
                        g_used[best] = True
                        d_matched[ti, di] = True
                        d_ignored[ti, di] = g_ignore[best]
        # unmatched detections outside the area range are ignored too
        d_area = np.clip(d_boxes[:, 2] - d_boxes[:, 0], 0, None) * np.clip(
            d_boxes[:, 3] - d_boxes[:, 1], 0, None
        )
        out_of_rng = (d_area < lo) | (d_area > hi)
        d_ignored |= (~d_matched) & out_of_rng[None, :]
        return d_scores, d_matched, d_ignored, int((~g_ignore).sum())

    def _accumulate(self, cls_ids, area_rng):
        """AP/AR per class for one area range."""
        n_iou = len(IOU_THRS)
        ap = np.full((n_iou, len(cls_ids)), np.nan)
        ar = np.full((n_iou, len(cls_ids)), np.nan)
        for ci, cls in enumerate(cls_ids):
            scores, matched, ignored = [], [], []
            n_gt = 0
            for p, t in zip(self._preds, self._targets):
                s, m, ig, ng = self._match_image(p, t, cls, area_rng)
                scores.append(s)
                matched.append(m)
                ignored.append(ig)
                n_gt += ng
            if n_gt == 0:
                continue
            scores = np.concatenate(scores)
            matched = np.concatenate(matched, axis=1)
            ignored = np.concatenate(ignored, axis=1)
            order = np.argsort(-scores, kind="mergesort")
            matched, ignored = matched[:, order], ignored[:, order]
            keep = ~ignored
            for ti in range(n_iou):
                tp = np.cumsum(matched[ti] & keep[ti])
                fp = np.cumsum(~matched[ti] & keep[ti])
                # drop ignored detections from the ranked list
                sel = keep[ti]
                tp, fp = tp[sel], fp[sel]
                if len(tp) == 0:
                    ap[ti, ci] = 0.0
                    ar[ti, ci] = 0.0
                    continue
                recall = tp / n_gt
                precision = tp / np.maximum(tp + fp, 1e-12)
                # monotone non-increasing precision envelope
                precision = np.maximum.accumulate(precision[::-1])[::-1]
                # 101-point interpolation
                idx = np.searchsorted(recall, REC_THRS, side="left")
                prec_i = np.where(
                    idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
                )
                ap[ti, ci] = prec_i.mean()
                ar[ti, ci] = recall[-1]
        return ap, ar

    def compute(self) -> Dict[str, float]:
        """Returns the standard COCO metric dict (coco_eval.py:122
        derive_coco_results equivalent, plus per-class AP)."""
        cls_ids = sorted(
            set(
                int(c)
                for t in self._targets
                for c in np.asarray(t["labels"]).reshape(-1).tolist()
            )
        )
        if not cls_ids:
            return {k: float("nan") for k in ("AP", "AP50", "AP75", "APs", "APm", "APl")}

        import warnings

        results: Dict[str, float] = {}
        with warnings.catch_warnings():
            # area buckets with no GT legitimately produce all-NaN slices
            warnings.simplefilter("ignore", category=RuntimeWarning)
            ap_all, _ = self._accumulate(cls_ids, AREA_RANGES["all"])
            results["AP"] = float(np.nanmean(ap_all))
            results["AP50"] = float(np.nanmean(ap_all[IOU_THRS == 0.5]))
            results["AP75"] = float(np.nanmean(ap_all[IOU_THRS == 0.75]))
            for name in ("small", "medium", "large"):
                ap_a, _ = self._accumulate(cls_ids, AREA_RANGES[name])
                results[f"AP{name[0]}"] = float(np.nanmean(ap_a))
            self.per_class_ap = {
                c: float(np.nanmean(ap_all[:, i])) for i, c in enumerate(cls_ids)
            }
        return results

    # ------------------------------------------------------------------
    def synchronize_between_processes(self):
        """Merge shards across hosts (reference coco_eval.py:105-120)."""
        from yolort_tpu.parallel.distributed import all_gather_objects

        merged = all_gather_objects({"preds": self._preds, "targets": self._targets})
        self._preds = [p for shard in merged for p in shard["preds"]]
        self._targets = [t for shard in merged for t in shard["targets"]]
