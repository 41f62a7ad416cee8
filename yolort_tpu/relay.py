"""Export-surface compatibility layer.

The reference's relay package reshapes the torch graph per export backend
(yolort/relay/: trace_wrapper.py:37 get_trace_module, logits_decoder.py:10
LogitsDecoder, trt_graphsurgeon.py:179 register_nms).  In the TPU-native
design these are thin views over the one jitted program — this module gives
them their familiar names so reference users find the same surfaces.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_trace_module(model, params, *, batch_size: int = 1, input_hw: Tuple[int, int] = (640, 640),
                     dtype=jnp.float32):
    """The jitted end-to-end callable + its lowered representation — the
    analog of tracing the model for LibTorch (trace_wrapper.py:37).

    Returns (jitted_fn, lowered) where ``lowered.as_text()`` is the
    StableHLO the artifact ships."""
    from yolort_tpu.models.transform import make_plan
    from yolort_tpu.runtime.aot import _pipeline_fn

    h, w = input_hw
    plan = make_plan([(h, w)], min_size=min(h, w), max_size=max(h, w))[0]
    fn = jax.jit(_pipeline_fn(model, plan, dtype))
    spec_p = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    lowered = fn.lower(spec_p, jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8))
    return fn, lowered


class LogitsDecoder:
    """NMS-free export surface: decoded (boxes, scores) exactly like the
    reference's LogitsDecoder (relay/logits_decoder.py:10,26) — the piece a
    backend-side NMS plugin would consume."""

    def __init__(self, model):
        self.model = model

    def __call__(self, params, images) -> Tuple[jax.Array, jax.Array]:
        pred = self.model.decode(params, images)  # (B, Na, 5+nc)
        boxes_cxcywh = pred[..., :4]
        boxes = jnp.concatenate(
            [boxes_cxcywh[..., :2] - boxes_cxcywh[..., 2:4] / 2,
             boxes_cxcywh[..., :2] + boxes_cxcywh[..., 2:4] / 2], axis=-1
        )
        scores = pred[..., 5:] * pred[..., 4:5]
        return boxes, scores


def register_nms(*args, **kwargs):
    raise NotImplementedError(
        "register_nms is a TensorRT graph-surgery step (relay/"
        "trt_graphsurgeon.py:179); in yolort_tpu the batched NMS is already "
        "inside the compiled program (ops/nms.py) — export with "
        "runtime.aot.export_aot instead."
    )
