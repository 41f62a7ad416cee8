"""Post-training quantization (PTQ) for yolort_tpu params.

Capability parity with the reference's INT8 PTQ deployment flow
(deployment/ppq — ProgramPQ calibration + quantized TensorRT engines),
re-designed for TPU:

  * **Weights** are quantized to int8 with per-output-channel symmetric
    scales and stored as (int8 values, f32 scales) — 4x smaller
    checkpoints/HBM footprint for weights.
  * At run time weights are dequantized into the compute dtype on the fly
    (XLA fuses the dequant multiply into the convolution's operand path);
    activations stay in bf16 — on TPU the MXU's native bf16 throughput makes
    activation-int8 unnecessary for this model family, so PTQ here is a
    memory/storage optimization with ~zero accuracy cost.
  * Optional calibration utilities compute activation ranges for users who
    export to int8-native targets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tensor_per_channel(w: np.ndarray, axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization with per-channel scales along ``axis``."""
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale)


def dequantize_tensor(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_tensor_per_channel (scale broadcast on last axis)."""
    return q.astype(dtype) * scale.astype(dtype)


def quantize_params(params: Dict, min_size: int = 512) -> Dict:
    """Quantize conv/linear weights ('w' leaves, >= min_size elements) to
    {'q': int8, 'scale': f32}; other leaves pass through."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and not isinstance(v, dict) and np.asarray(v).size >= min_size:
                    q, scale = quantize_tensor_per_channel(np.asarray(v))
                    out["w"] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_params(params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Materialize a quantized pytree back to dense weights in ``dtype``.

    Kept as jnp ops so it can run inside jit — XLA fuses the dequant into
    the first use of each weight."""

    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return dequantize_tensor(node["q"], node["scale"], dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantization_error(params: Dict, qparams: Dict) -> Dict[str, float]:
    """Max relative weight error introduced by PTQ, per top-level group."""
    out = {}
    deq = dequantize_params(qparams, jnp.float32)
    for key in params:
        orig = jax.tree_util.tree_leaves(params[key])
        new = jax.tree_util.tree_leaves(deq[key])
        errs = [
            float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
            for a, b in zip(orig, new)
            if a.shape == b.shape
        ]
        out[key] = max(errs) if errs else 0.0
    return out


class CalibrationObserver:
    """Activation-range calibration (moving abs-max over batches) for
    exporting to int8-native runtimes."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ranges: Dict[str, float] = {}

    def observe(self, name: str, x) -> None:
        amax = float(jnp.max(jnp.abs(x)))
        if name in self.ranges:
            self.ranges[name] = self.momentum * self.ranges[name] + (1 - self.momentum) * amax
        else:
            self.ranges[name] = amax

    def scales(self) -> Dict[str, float]:
        return {k: v / 127.0 for k, v in self.ranges.items()}
