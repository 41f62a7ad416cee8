"""Model ensembling.

Capability parity with the reference's Ensemble (v5/models/experimental.py:74,
NMS-merge flavor): run several YOLO models on the same batch, pool their
decoded predictions, and NMS the union — all inside one jit program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolort_tpu.ops.nms import Detections, batched_postprocess


class Ensemble:
    """Ensemble of YOLO specs + params (must share num_classes)."""

    def __init__(self, models: Sequence, params: Sequence):
        assert len(models) == len(params) >= 1
        nc = {m.num_classes for m in models}
        assert len(nc) == 1, "ensemble members must share num_classes"
        self.models = list(models)
        self.params = list(params)
        self.num_classes = models[0].num_classes
        lead = models[0]
        self._post_cfg = dict(
            num_classes=lead.num_classes,
            score_thresh=lead.score_thresh,
            nms_thresh=lead.nms_thresh,
            detections_per_img=lead.detections_per_img,
            pre_nms_topk=lead.pre_nms_topk,
            nms_tile_size=lead.nms_tile_size,
            nms_impl=lead.nms_impl,
        )

    def __call__(self, images: jax.Array) -> Detections:
        """NMS-ensemble: concat every member's decoded predictions along the
        anchor axis, then one shared NMS (the reference's default 'nms
        ensemble' mode)."""
        preds = [
            m.decode(p, images) for m, p in zip(self.models, self.params)
        ]  # each (B, Na_i, 5+nc)
        pooled = jnp.concatenate(preds, axis=1)
        return batched_postprocess(pooled, **self._post_cfg)
