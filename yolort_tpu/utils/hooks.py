"""Intermediate-activation taps.

The reference's FeatureExtractor (yolort/utils/hooks.py:7) registers torch
forward hooks; in a functional JAX model, intermediates are simply returned.
``FeatureExtractor`` re-runs the pure functions and collects every backbone
layer / PAN level / head level output by name.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax


class FeatureExtractor:
    """Collect named intermediate activations of a YOLO model.

    Example:
        fx = FeatureExtractor(model)
        feats = fx(params, images)   # {'backbone.0': ..., 'pan.0': ..., ...}
    """

    def __init__(self, model, return_layers: Sequence[str] = ("backbone", "pan", "head")):
        self.model = model
        self.return_layers = set(return_layers)

    def __call__(self, params, images) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        x = images
        feats: List[jax.Array] = []
        bb = self.model.backbone
        for i, layer in enumerate(bb.layers):
            x = layer(params["backbone"][str(i)], x)
            if "backbone" in self.return_layers:
                out[f"backbone.{i}"] = x
            if i in bb.returned_layers:
                feats.append(x)
        pan_outs = self.model.pan(params["pan"], feats)
        if "pan" in self.return_layers:
            for i, f in enumerate(pan_outs):
                out[f"pan.{i}"] = f
        if "head" in self.return_layers:
            for i, h in enumerate(self.model.head(params["head"], pan_outs)):
                out[f"head.{i}"] = h
        return out
