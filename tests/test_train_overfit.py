"""End-to-end training regression: overfit a nano model on one synthetic
image and verify the trained detector localizes the object.

This is the offline analog of the reference's coco128 mAP-floor regression
(test/test_models_yolov5.py:78-95) — no dataset downloads exist in this
environment, so we pin train->detect functionality instead of an absolute
mAP number."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.models.losses import pad_targets
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.trainer import DefaultTask, make_train_step


@pytest.mark.slow
@pytest.mark.slow
def test_overfit_single_image_detects_object():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.4, (96, 96, 3)).astype(np.float32)
    # bright square "object" at a known location
    img[24:72, 32:80] = rng.uniform(0.8, 1.0, (48, 48, 3))
    gt_box = np.asarray([32.0, 24.0, 80.0, 72.0])  # xyxy
    images = jnp.asarray(img[None])
    targets, mask = pad_targets(
        [{
            "labels": np.asarray([0]),
            "boxes_cxcywh_norm": np.asarray([[(32 + 80) / 2 / 96, (24 + 72) / 2 / 96, 48 / 96, 48 / 96]]),
        }],
        4,
    )

    model = build_yolo(
        "yolov5_darknet_pan_n_r60", num_classes=2, score_thresh=0.1,
        pre_nms_topk=256, nms_tile_size=64,
    )
    task = DefaultTask(model, lr=0.05)
    step = make_train_step(task)
    state = task.init_state(jax.random.PRNGKey(0))
    losses = []
    for i in range(300):
        state, metrics = step(state, images, targets, mask)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses[-1]) and losses[-1] < 0.6 * losses[0]

    det = model(state.params, images)
    n = int(det.num[0])
    assert n >= 1, "trained model found no objects"

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        inter = np.prod(np.clip(rb - lt, 0, None))
        ua = np.prod(a[2:] - a[:2]) + np.prod(b[2:] - b[:2]) - inter
        return inter / ua

    top_boxes = np.asarray(det.boxes[0][: min(n, 5)])
    best_iou = max(iou(b, gt_box) for b in top_boxes)
    assert best_iou > 0.5, f"best IoU {best_iou:.3f}; boxes {top_boxes} vs gt {gt_box}"
    assert int(det.labels[0][0]) == 0
