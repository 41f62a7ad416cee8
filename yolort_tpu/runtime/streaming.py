"""Pinned-shape streaming inference pipeline.

The BASELINE 'video-rate' configuration: batch-N uint8 frames at a fixed
shape, fused normalize+letterbox+model+NMS, with host->HBM transfer of the
next batch overlapped against device compute of the current one (JAX
dispatch is asynchronous, so a one-deep software pipeline suffices — the
double-buffering the reference gets from pinned CUDA memory + execute_v2,
y_tensorrt.py:146-167)."""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolort_tpu.models.transform import LetterboxPlan, letterbox_batch, make_plan


class StreamingPipeline:
    def __init__(
        self,
        model,
        params,
        *,
        batch_size: int = 32,
        input_hw: Tuple[int, int] = (640, 640),
        dtype=jnp.bfloat16,
    ):
        from yolort_tpu.utils import cast_floating

        self.batch_size = batch_size
        self.input_hw = input_hw
        self.model = model
        self.params = cast_floating(params, dtype)
        h, w = input_hw
        plan = make_plan([(h, w)], min_size=min(h, w), max_size=max(h, w))[0]
        self.canvas_hw = plan.canvas_hw

        def pipeline(params, raw_u8):
            imgs = raw_u8.astype(dtype) * (1.0 / 255.0)
            canvas = letterbox_batch(imgs, plan)
            return model(params, canvas)

        from yolort_tpu.utils.compile_options import tpu_compiler_options

        self._fn = jax.jit(pipeline, compiler_options=tpu_compiler_options())

    def warmup(self, iters: int = 2) -> None:
        dummy = jnp.zeros((self.batch_size, *self.input_hw, 3), jnp.uint8)
        for _ in range(iters):
            jax.device_get(self._fn(self.params, dummy).num)

    def _batches(self, frames: Iterable[np.ndarray]) -> Iterator[Tuple[np.ndarray, int]]:
        buf: List[np.ndarray] = []
        for f in frames:
            buf.append(np.asarray(f, np.uint8))
            if len(buf) == self.batch_size:
                yield np.stack(buf), self.batch_size
                buf = []
        if buf:
            n = len(buf)
            while len(buf) < self.batch_size:  # pad the tail batch
                buf.append(buf[-1])
            yield np.stack(buf), n

    def run(self, frames: Iterable[np.ndarray]) -> Iterator[Dict[str, np.ndarray]]:
        """Stream uint8 HWC frames (must match input_hw); yields per-frame
        detection dicts.  Keeps one batch in flight: while the device works
        on batch i, batch i+1 is staged host->HBM."""
        pending = None  # (detections future, n_valid)
        for arr, n in self._batches(frames):
            staged = jax.device_put(jnp.asarray(arr))  # async H2D
            if pending is not None:
                yield from self._drain(*pending)
            pending = (self._fn(self.params, staged), n)  # async dispatch
        if pending is not None:
            yield from self._drain(*pending)

    def _drain(self, det, n_valid: int) -> Iterator[Dict[str, np.ndarray]]:
        det = jax.device_get(det)
        for i in range(n_valid):
            n = int(det.num[i])
            yield {
                "boxes": np.asarray(det.boxes[i][:n], np.float32),
                "scores": np.asarray(det.scores[i][:n], np.float32),
                "labels": np.asarray(det.labels[i][:n], np.int64),
            }
