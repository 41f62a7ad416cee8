"""Profiling and tracing helpers.

The reference's three tracing mechanisms (SURVEY.md §5: thop layer FLOPs,
cuda-synced time_sync, TorchScript IR dumps) map to: XLA cost analysis
(utils/ir_visualizer.cost_analysis), jax.profiler device traces, and
jaxpr/HLO dumps.  This module wraps the trace + timing pieces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto
    (replaces AutoShape's pre/infer/NMS ms report with a real timeline)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_sync() -> float:
    """Accurate wall time after draining in-flight device work (the jax
    analog of the reference's cuda-synced time_sync, torch_utils.py:94).

    NOTE: through remote-relay backends, only a device->host fetch truly
    drains work; prefer fetch-based timing (see bench.py) there."""
    try:
        jax.effects_barrier()
    except Exception:
        pass
    return time.perf_counter()


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory statistics where the backend exposes them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, float)) and "bytes" in k
            }
    return out


def model_info(model, params) -> str:
    """Summary string (layer/param counts + compiler FLOPs estimate) —
    capability parity with v5/utils/torch_utils.py:250 model_info."""
    import jax.numpy as jnp

    from yolort_tpu.utils import count_params
    from yolort_tpu.utils.ir_visualizer import cost_analysis

    n_params = count_params(params)
    lines = [f"params: {n_params / 1e6:.2f}M"]
    try:
        x = jnp.zeros((1, 640, 640, 3), jnp.float32)
        costs = cost_analysis(lambda p, x: model.head_outputs(p, x), params, x)
        flops = costs.get("flops")
        if flops:
            lines.append(f"forward FLOPs @640: {flops / 1e9:.1f} G")
    except Exception:
        pass
    return ", ".join(lines)
