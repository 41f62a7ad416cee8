"""Host-side data augmentation for detection training.

Capability parity with the reference's two augmentation stacks:
the SSD-style torchvision transforms (yolort/data/transforms.py:21-335) and
the YOLOv5 augmentations (v5/utils/augmentations.py: augment_hsv:53,
random_perspective:141, mixup:307).  Implemented fresh in numpy/cv2; these
run on the host feeding the fixed-shape device pipeline.

All transforms are callables ``(image, target) -> (image, target)`` over
HWC-RGB float [0,1] images and COCO-style targets ({'boxes' xyxy,'labels'}).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, target):
        for t in self.transforms:
            img, target = t(img, target)
        return img, target


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5, seed: Optional[int] = None):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, target):
        if self.rng.random() < self.p:
            img = img[:, ::-1].copy()
            w = img.shape[1]
            boxes = target["boxes"].copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
            target = dict(target, boxes=boxes)
        return img, target


class RandomHSV:
    """YOLOv5 HSV color jitter (augmentations.py:53)."""

    def __init__(self, h_gain=0.015, s_gain=0.7, v_gain=0.4, seed: Optional[int] = None):
        self.gains = (h_gain, s_gain, v_gain)
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, target):
        import cv2

        r = self.rng.uniform(-1, 1, 3) * np.asarray(self.gains) + 1
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV)
        h, s, v = cv2.split(hsv)
        lut_h = ((np.arange(256) * r[0]) % 180).astype(np.uint8)
        lut_s = np.clip(np.arange(256) * r[1], 0, 255).astype(np.uint8)
        lut_v = np.clip(np.arange(256) * r[2], 0, 255).astype(np.uint8)
        hsv = cv2.merge((cv2.LUT(h, lut_h), cv2.LUT(s, lut_s), cv2.LUT(v, lut_v)))
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0
        return out, target


class RandomZoomOut:
    """Place the image on a larger fill canvas (data/transforms.py:209)."""

    def __init__(self, max_scale: float = 4.0, fill: float = 114.0 / 255.0,
                 p: float = 0.5, seed: Optional[int] = None):
        self.max_scale = max_scale
        self.fill = fill
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, target):
        if self.rng.random() >= self.p:
            return img, target
        h, w = img.shape[:2]
        scale = self.rng.uniform(1.0, self.max_scale)
        nh, nw = int(h * scale), int(w * scale)
        top = int(self.rng.uniform(0, nh - h))
        left = int(self.rng.uniform(0, nw - w))
        canvas = np.full((nh, nw, img.shape[2]), self.fill, img.dtype)
        canvas[top : top + h, left : left + w] = img
        boxes = target["boxes"].copy()
        boxes[:, [0, 2]] += left
        boxes[:, [1, 3]] += top
        return canvas, dict(target, boxes=boxes, orig_size=np.asarray([nh, nw]))


class RandomScaleTranslate:
    """Affine scale+translate keeping boxes (the non-rotational core of
    v5 random_perspective, augmentations.py:141)."""

    def __init__(self, scale: Tuple[float, float] = (0.5, 1.5), translate: float = 0.1,
                 fill: float = 114.0 / 255.0, min_box: float = 2.0,
                 seed: Optional[int] = None):
        self.scale = scale
        self.translate = translate
        self.fill = fill
        self.min_box = min_box
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, target):
        import cv2

        h, w = img.shape[:2]
        s = self.rng.uniform(*self.scale)
        tx = self.rng.uniform(0.5 - self.translate, 0.5 + self.translate) * w - s * w / 2
        ty = self.rng.uniform(0.5 - self.translate, 0.5 + self.translate) * h - s * h / 2
        m = np.asarray([[s, 0, tx], [0, s, ty]], np.float32)
        out = cv2.warpAffine(img, m, (w, h), borderValue=(self.fill,) * 3)
        boxes = target["boxes"].copy()
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]] * s + tx
            boxes[:, [1, 3]] = boxes[:, [1, 3]] * s + ty
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            keep = ((boxes[:, 2] - boxes[:, 0]) > self.min_box) & (
                (boxes[:, 3] - boxes[:, 1]) > self.min_box
            )
            target = dict(
                target,
                boxes=boxes[keep],
                labels=target["labels"][keep],
            )
            for k in ("area", "iscrowd"):
                if k in target and len(target[k]) == len(keep):
                    target[k] = target[k][keep]
        return out, target


class Mixup:
    """Blend two samples (augmentations.py:307). Apply at the batch level."""

    def __init__(self, beta: float = 32.0, seed: Optional[int] = None):
        self.beta = beta
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample_a, sample_b):
        img_a, tgt_a = sample_a
        img_b, tgt_b = sample_b
        if img_a.shape != img_b.shape:
            return sample_a
        lam = self.rng.beta(self.beta, self.beta)
        img = img_a * lam + img_b * (1 - lam)
        tgt = dict(
            tgt_a,
            boxes=np.concatenate([tgt_a["boxes"], tgt_b["boxes"]]),
            labels=np.concatenate([tgt_a["labels"], tgt_b["labels"]]),
        )
        return img.astype(np.float32), tgt


def default_train_transforms(seed: Optional[int] = None) -> Compose:
    """Default training augmentation stack (reference
    data/transforms.py:21-33 role)."""
    return Compose(
        [
            RandomScaleTranslate(seed=seed),
            RandomHSV(seed=seed),
            RandomHorizontalFlip(seed=seed),
        ]
    )


def default_val_transforms() -> Compose:
    return Compose([])
