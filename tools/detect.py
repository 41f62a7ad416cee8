#!/usr/bin/env python
"""Run detection over images/videos and save rendered results.

The yolort_tpu analog of the ultralytics detect flow that the reference
exposes through AutoShape (v5/models/common.py:448) + LoadImages
(v5/utils/datasets.py:56)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path


def cli_main():
    ap = argparse.ArgumentParser("yolort_tpu detect")
    ap.add_argument("--source", required=True, help="image/video file, dir, or glob")
    ap.add_argument("--checkpoint_path", default=None, help="ultralytics .pt (optional)")
    ap.add_argument("--arch", default="yolov5_darknet_pan_s_r60")
    ap.add_argument("--score_thresh", type=float, default=0.25)
    ap.add_argument("--nms_thresh", type=float, default=0.45)
    ap.add_argument("--save_dir", default="runs/detect")
    ap.add_argument("--crop", action="store_true", help="also save per-detection crops")
    ap.add_argument("--device", default=None, help="jax platform override (e.g. cpu, tpu)")
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    from yolort_tpu.data.datasets import LoadImages
    from yolort_tpu.models.yolov5 import YOLOv5
    from yolort_tpu.utils.results import DetectionResults

    if args.checkpoint_path:
        model = YOLOv5.load_from_yolov5(
            args.checkpoint_path, score_thresh=args.score_thresh, nms_thresh=args.nms_thresh
        )
    else:
        model = YOLOv5(arch=args.arch, score_thresh=args.score_thresh, nms_thresh=args.nms_thresh)

    files, images = [], []
    for f, img in LoadImages(args.source):
        files.append(f)
        images.append(img)
    preds = model(images)
    results = DetectionResults(images, preds, files=files)
    results.print()
    saved = results.save(args.save_dir)
    print(f"saved {len(saved)} rendered images to {args.save_dir}")
    if args.crop:
        results.crop(save_dir=str(Path(args.save_dir) / "crops"))


if __name__ == "__main__":
    cli_main()
