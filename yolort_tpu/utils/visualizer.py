"""Detection visualizer.

Capability parity with the reference's detectron2-style ``Visualizer``
(yolort/utils/visualizer.py:16): draws instance predictions (or ground
truth) with class-colored boxes and score labels; metalabels can come from a
sequence, a file, or default to COCO.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Union

import numpy as np

from yolort_tpu.data.builtin_meta import COCO_CLASSES
from yolort_tpu.utils.image_utils import overlay_boxes


class Visualizer:
    def __init__(
        self,
        image: np.ndarray,
        metalabels: Union[Sequence[str], str, None] = None,
    ):
        """image: HWC uint8 or float [0,1], RGB."""
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        self.image = np.ascontiguousarray(image)
        if metalabels is None:
            self.class_names = list(COCO_CLASSES)
        elif isinstance(metalabels, (str, Path)):
            self.class_names = [
                l.strip() for l in Path(metalabels).read_text().splitlines() if l.strip()
            ]
        else:
            self.class_names = list(metalabels)

    def draw_instance_predictions(self, predictions: Dict[str, np.ndarray]) -> np.ndarray:
        """predictions: {'boxes','scores','labels'} in image coordinates."""
        self.image = overlay_boxes(self.image, predictions, self.class_names)
        return self.image

    def draw_ground_truth(self, target: Dict[str, np.ndarray]) -> np.ndarray:
        fake = {
            "boxes": np.asarray(target["boxes"]),
            "scores": np.ones(len(target["boxes"]), np.float32),
            "labels": np.asarray(target["labels"]),
        }
        self.image = overlay_boxes(self.image, fake, self.class_names, score_format="{name}")
        return self.image

    def save(self, path: str) -> None:
        from yolort_tpu.utils.image_utils import save_image

        save_image(path, self.image)

    def imshow(self, scale: float = 1.0):  # pragma: no cover - needs display
        import cv2

        img = self.image
        if scale != 1.0:
            img = cv2.resize(img, None, fx=scale, fy=scale)
        cv2.imshow("yolort_tpu", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.waitKey(0)
