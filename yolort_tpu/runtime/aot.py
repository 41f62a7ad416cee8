"""Ahead-of-time export + serving runtime.

This is the TPU-native collapse of the reference's entire export/deploy zoo
(SURVEY.md L2/L3): where the reference maintains ONNX export paths
(runtime/ort_helper.py:24), a TensorRT engine builder (runtime/trt_helper.py:96)
and per-backend predictors (PredictorORT y_onnxruntime.py:15, PredictorTRT
y_tensorrt.py:25), here the *same* jitted end-to-end graph is serialized once
with jax.export (StableHLO) and re-loaded by a thin predictor — or by the
C++ PJRT driver in deployment/ for Python-free serving.

The artifact bundles:
  * the serialized StableHLO program (letterbox -> model -> NMS in-graph)
  * the params pytree (npz)
  * metadata (arch, input spec, thresholds)
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pipeline_fn(model, plan, dtype):
    from yolort_tpu.models.transform import letterbox_batch

    def fn(params, raw_u8):
        imgs = raw_u8.astype(dtype) * (1.0 / 255.0)
        canvas = letterbox_batch(imgs, plan)
        det = model(params, canvas)
        return det.boxes, det.scores, det.labels, det.num

    return fn


def export_aot(
    model,
    params,
    path: str,
    *,
    batch_size: int = 1,
    input_hw: Tuple[int, int] = (640, 640),
    dtype=jnp.float32,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Serialize the full uint8-in/detections-out pipeline to one artifact.

    Exported multi-platform by default so an artifact produced on a TPU host
    also serves on CPU (and vice versa).  Replaces the reference's
    export_onnx / export_tensorrt_engine CLIs (tools/export_model.py:17-197).
    """
    from jax import export as jexport

    from yolort_tpu.models._checkpoint import _flatten
    from yolort_tpu.models.transform import LetterboxPlan, make_plan
    from yolort_tpu.utils import cast_floating

    h, w = input_hw
    plan = make_plan([(h, w)], min_size=min(h, w), max_size=max(h, w))[0]
    params = cast_floating(params, dtype)
    if len(platforms) > 1 and getattr(model, "nms_impl", None) == "auto":
        # the Pallas NMS kernel has no CPU lowering; portable artifacts use
        # the XLA suppression path (identical results)
        from dataclasses import replace as _replace

        model = _replace(model, nms_impl="xla")
    fn = _pipeline_fn(model, plan, dtype)

    raw_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    param_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(param_specs, raw_spec)
    blob = exported.serialize()

    meta_out = {
        "batch_size": batch_size,
        "input_hw": list(input_hw),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "canvas_hw": list(plan.canvas_hw),
        **(meta or {}),
    }
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("program.stablehlo", blob)
        zf.writestr("meta.json", json.dumps(meta_out))
        buf = io.BytesIO()
        np.savez(buf, **_flatten(jax.device_get(params)))
        zf.writestr("params.npz", buf.getvalue())
    return path


def export_stablehlo_binary(
    model,
    params,
    path: str,
    *,
    batch_size: int = 1,
    input_hw: Tuple[int, int] = (640, 640),
    dtype=jnp.float32,
) -> str:
    """Write the raw StableHLO bytecode of the uint8->detections pipeline
    with the parameters baked in as constants — the artifact the C++ PJRT
    driver (deployment/pjrt/main.cpp) compiles and serves without Python."""
    from jax import export as jexport

    from yolort_tpu.models.transform import make_plan
    from yolort_tpu.utils import cast_floating

    h, w = input_hw
    plan = make_plan([(h, w)], min_size=min(h, w), max_size=max(h, w))[0]
    params = cast_floating(params, dtype)
    fn = _pipeline_fn(model, plan, dtype)

    raw_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(lambda raw: fn(params, raw)))(raw_spec)
    with open(path, "wb") as f:
        f.write(exported.mlir_module_serialized)
    return path


def load_aot(path: str) -> "AOTPredictor":
    return AOTPredictor(path)


class AOTPredictor:
    """Loads a serialized artifact and serves it (counterpart of the
    reference's PredictorORT / PredictorTRT, minus the backend zoo)."""

    def __init__(self, path: str):
        from jax import export as jexport

        from yolort_tpu.models._checkpoint import _unflatten

        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read("meta.json").decode())
            self.exported = jexport.deserialize(zf.read("program.stablehlo"))
            with np.load(io.BytesIO(zf.read("params.npz"))) as data:
                self.params = _unflatten({k: data[k] for k in data.files})
        from yolort_tpu.utils.compile_options import tpu_compiler_options

        self._call = jax.jit(
            self.exported.call, compiler_options=tpu_compiler_options()
        )

    def __call__(self, raw_u8: np.ndarray):
        """raw_u8: (B, H, W, 3) uint8 frames matching the exported spec.
        Returns (boxes, scores, labels, num) padded arrays."""
        b, h, w, _ = raw_u8.shape
        eb, (eh, ew) = self.meta["batch_size"], self.meta["input_hw"]
        if (b, h, w) != (eb, eh, ew):
            raise ValueError(
                f"input shape {(b, h, w)} does not match exported spec {(eb, eh, ew)}"
            )
        return self._call(self.params, jnp.asarray(raw_u8))

    def predict(self, raw_u8: np.ndarray):
        """Slice padded outputs into per-image detection dicts."""
        boxes, scores, labels, num = jax.device_get(self(raw_u8))
        out = []
        for i in range(raw_u8.shape[0]):
            n = int(num[i])
            out.append(
                {
                    "boxes": np.asarray(boxes[i][:n]),
                    "scores": np.asarray(scores[i][:n]),
                    "labels": np.asarray(labels[i][:n], np.int64),
                }
            )
        return out

    def warmup(self, iters: int = 2):
        dummy = np.zeros(
            (self.meta["batch_size"], *self.meta["input_hw"], 3), np.uint8
        )
        for _ in range(iters):
            jax.block_until_ready(self(dummy))
