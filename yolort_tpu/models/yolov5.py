"""End-to-end YOLOv5 wrapper: letterbox + model + NMS + coordinate rescale,
all inside one jit-compiled XLA program.

Public-API re-design of ``yolort/models/yolov5.py:19`` (class YOLOv5):
``predict()`` accepts image paths / numpy arrays / jax arrays, exactly like
the reference's predict (yolov5.py:203) — but the compiled pipeline is a pure
function specialized per raw input shape (bucketed static shapes replace the
reference's dynamic letterbox rectangles).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolort_tpu.models.transform import (
    letterbox_batch,
    make_plan,
    scale_coords_back,
)
from yolort_tpu.models.yolo import YOLO, build_yolo
from yolort_tpu.ops.blocks import Params
from yolort_tpu.ops.nms import Detections


def read_image(path: str) -> np.ndarray:
    """Default loader: RGB float32 in [0, 1], HWC (reference
    yolov5.py:218-228 uses torchvision.io.read_image / 255)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


class YOLOv5:
    """User-facing end-to-end model.

    Args mirror the reference (yolov5.py:96-107): ``size`` is the
    (min_size, max_size) letterbox target, ``size_divisible`` the stride
    rounding, ``fixed_shape`` pins the canvas (static-shape serving),
    ``fill_color`` the pad value.
    """

    def __init__(
        self,
        arch: Optional[str] = None,
        model: Optional[YOLO] = None,
        params: Optional[Params] = None,
        num_classes: int = 80,
        pretrained: bool = False,
        progress: bool = True,  # kept for API parity; unused
        size: Tuple[int, int] = (640, 640),
        size_divisible: int = 32,
        fixed_shape: Optional[Tuple[int, int]] = None,
        fill_color: int = 114,
        dtype=jnp.float32,
        seed: int = 0,
        **kwargs: Any,
    ) -> None:
        if model is None:
            model = build_yolo(arch, num_classes=num_classes, **kwargs)
        self.arch = arch
        self.model = model
        self.num_classes = model.num_classes
        self.size = size
        self.size_divisible = size_divisible
        self.fixed_shape = fixed_shape
        self.fill_color = fill_color
        self.dtype = dtype

        if params is None:
            if pretrained:
                from yolort_tpu.models._checkpoint import load_pretrained_params

                params = load_pretrained_params(arch, model)
            else:
                params = model.init(jax.random.PRNGKey(seed))
        self.params = params
        from yolort_tpu.utils.compile_options import tpu_compiler_options

        _opts = tpu_compiler_options()  # measured TPU default (utils/compile_options.py)
        self._jit_infer = jax.jit(self._infer, compiler_options=_opts)
        self._jit_infer_fixed = jax.jit(self._infer_fixed, compiler_options=_opts)

    # ------------------------------------------------------------------
    def _infer(self, params: Params, raw: jax.Array) -> Detections:
        """raw: (B, H, W, 3) float in [0,1], one shape bucket. Everything in
        here is traced into a single XLA program."""
        b, h, w, _ = raw.shape
        plan = make_plan(
            [(h, w)],
            min_size=self.size[0],
            max_size=self.size[1],
            size_divisible=self.size_divisible,
            fixed_shape=self.fixed_shape,
        )[0]
        canvas = letterbox_batch(raw.astype(self.dtype), plan, self.fill_color / 255.0)
        det = self.model(params, canvas)
        orig = jnp.asarray([h, w], jnp.float32)
        boxes = scale_coords_back(det.boxes, plan.canvas_hw, orig)
        return det._replace(boxes=boxes)

    def _infer_fixed(self, params: Params, canvases: jax.Array, orig_hw: jax.Array) -> Detections:
        """Fixed-canvas inference (host letterbox already applied): one
        compiled program serves arbitrary raw sizes."""
        det = self.model(params, canvases.astype(self.dtype))
        boxes = scale_coords_back(det.boxes, self.fixed_shape, orig_hw[:, None, :])
        return det._replace(boxes=boxes)

    def __call__(self, inputs: Sequence[Any]) -> List[Dict[str, np.ndarray]]:
        """Run inference on a list of HWC float images.

        Mixed sizes are allowed: with ``fixed_shape`` set, heterogeneous
        batches are host-letterboxed onto one static canvas and served by a
        single compiled program (the reference's PredictorTRT pattern,
        y_tensorrt.py:130-144); otherwise same-size images are batched per
        compiled shape bucket (in-graph letterbox)."""
        images = [np.asarray(x, np.float32) for x in inputs]
        results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(images)

        if self.fixed_shape is not None and len({im.shape[:2] for im in images}) > 1:
            from yolort_tpu.models.transform import letterbox_numpy

            canvases = np.stack(
                [letterbox_numpy(im, self.fixed_shape, self.size[0], self.size[1],
                                 self.fill_color / 255.0) for im in images]
            )
            orig = np.asarray([im.shape[:2] for im in images], np.float32)
            det = jax.device_get(
                self._jit_infer_fixed(self.params, jnp.asarray(canvases), jnp.asarray(orig))
            )
            for i in range(len(images)):
                n = int(det.num[i])
                results[i] = {
                    "boxes": np.asarray(det.boxes[i][:n], np.float32),
                    "scores": np.asarray(det.scores[i][:n], np.float32),
                    "labels": np.asarray(det.labels[i][:n], np.int64),
                }
            return results  # type: ignore[return-value]

        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, im in enumerate(images):
            groups.setdefault(im.shape[:2], []).append(i)

        for _, idxs in groups.items():
            batch = jnp.asarray(np.stack([images[i] for i in idxs]))
            det = self._jit_infer(self.params, batch)
            det = jax.device_get(det)
            for j, i in enumerate(idxs):
                n = int(det.num[j])
                results[i] = {
                    "boxes": np.asarray(det.boxes[j][:n], np.float32),
                    "scores": np.asarray(det.scores[j][:n], np.float32),
                    "labels": np.asarray(det.labels[j][:n], np.int64),
                }
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def predict(self, x: Any, image_loader: Optional[Callable] = None) -> List[Dict[str, np.ndarray]]:
        """Predict on raw data: path / list of paths / array / list of arrays
        (reference yolov5.py:203-216)."""
        loader = image_loader or read_image
        images = self.collate_images(x, loader)
        return self(images)

    def predict_rich(self, x: Any, image_loader: Optional[Callable] = None):
        """Predict and wrap results in a DetectionResults object with
        print/render/crop/pandas accessors (the reference AutoShape's
        Detections role, v5/models/common.py:448,555)."""
        from yolort_tpu.utils.results import DetectionResults

        loader = image_loader or read_image
        files = [x] if isinstance(x, str) else (
            [s for s in x if isinstance(s, str)] if isinstance(x, (list, tuple)) else None
        )
        images = self.collate_images(x, loader)
        preds = self(images)
        return DetectionResults(images, preds, files=files if files else None)

    @staticmethod
    def collate_images(samples: Any, image_loader: Callable) -> List[np.ndarray]:
        if isinstance(samples, str):
            samples = [samples]
        if isinstance(samples, (np.ndarray, jnp.ndarray)) and getattr(samples, "ndim", 0) == 3:
            samples = [samples]
        out = []
        for s in samples:
            if isinstance(s, str):
                out.append(image_loader(s))
            else:
                arr = np.asarray(s, np.float32)
                if arr.ndim != 3:
                    raise ValueError(f"expected HWC image, got shape {arr.shape}")
                out.append(arr)
        return out

    # ------------------------------------------------------------------
    @classmethod
    def load_from_yolov5(
        cls,
        checkpoint_path: str,
        *,
        size: Tuple[int, int] = (640, 640),
        size_divisible: int = 32,
        fixed_shape: Optional[Tuple[int, int]] = None,
        fill_color: int = 114,
        score_thresh: float = 0.25,
        nms_thresh: float = 0.45,
        version: str = "r6.0",
        **kwargs: Any,
    ) -> "YOLOv5":
        """Build from an ultralytics/yolov5 checkpoint
        (reference yolov5.py:264-297)."""
        from yolort_tpu.models._checkpoint import load_from_ultralytics

        info = load_from_ultralytics(checkpoint_path, version=version)
        model = YOLO(
            depth_multiple=info["depth_multiple"],
            width_multiple=info["width_multiple"],
            version=version,
            num_classes=info["num_classes"],
            use_p6=info["use_p6"],
            strides=tuple(info["strides"]),
            anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            **kwargs,
        )
        return cls(
            model=model,
            params=info["params"],
            size=size,
            size_divisible=size_divisible,
            fixed_shape=fixed_shape,
            fill_color=fill_color,
        )
