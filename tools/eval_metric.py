#!/usr/bin/env python
"""COCO mAP evaluation loop.

CLI parity with tools/eval_metric.py:101-189 in the reference — but with
multi-chip batch-sharded inference (which the reference explicitly raises
NotImplementedError for, eval_metric.py:109).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time


def parse_args():
    ap = argparse.ArgumentParser("yolort_tpu COCO evaluation")
    ap.add_argument("--checkpoint_path", required=True, help="ultralytics .pt or yolort_tpu .npz")
    ap.add_argument("--arch", default=None, help="arch name (required for .npz)")
    ap.add_argument("--num_classes", type=int, default=None)
    ap.add_argument("--version", default="r6.0")
    ap.add_argument("--image_path", required=True, help="COCO image dir")
    ap.add_argument("--annotation_path", required=True, help="instances json")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=640)
    ap.add_argument("--score_thresh", type=float, default=0.005)
    ap.add_argument("--nms_thresh", type=float, default=0.45)
    ap.add_argument("--num_chips", type=int, default=0, help="0 = all available")
    ap.add_argument("--print_freq", type=int, default=20)
    ap.add_argument("--device", default=None, help="jax platform override (e.g. cpu, tpu)")
    return ap.parse_args()


def cli_main():
    args = parse_args()
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from yolort_tpu.data import COCODetection, COCOEvaluator, DetectionDataModule
    from yolort_tpu.models.transform import scale_coords_back
    from yolort_tpu.models.yolov5 import YOLOv5
    from yolort_tpu.parallel import data_parallel_infer, make_mesh, replicate
    from yolort_tpu.utils.logger import MetricLogger

    if args.checkpoint_path.endswith(".npz"):
        # native yolort_tpu checkpoint (e.g. from tools/train.py)
        from yolort_tpu.models._checkpoint import load_params
        from yolort_tpu.models.yolo import build_yolo

        params, meta = load_params(args.checkpoint_path)
        if not args.arch:
            raise SystemExit("--arch is required for .npz checkpoints")
        model = build_yolo(
            args.arch,
            num_classes=int(meta.get("num_classes", args.num_classes or 80)),
            score_thresh=args.score_thresh,
            nms_thresh=args.nms_thresh,
        )
    else:
        wrapper = YOLOv5.load_from_yolov5(
            args.checkpoint_path,
            version=args.version,
            score_thresh=args.score_thresh,
            nms_thresh=args.nms_thresh,
        )
        model, params = wrapper.model, wrapper.params

    ds = COCODetection(args.image_path, args.annotation_path)
    s = args.image_size
    dm = DetectionDataModule(ds, batch_size=args.batch_size, canvas_hw=(s, s),
                             min_size=s, max_size=s)

    devices = jax.devices()[: args.num_chips] if args.num_chips else jax.devices()
    if len(devices) > 1 and args.batch_size % len(devices) == 0:
        mesh = make_mesh(devices)
        infer = data_parallel_infer(model, mesh)
        params_dev = replicate(mesh, params)
    else:
        infer = jax.jit(lambda p, x: model(p, x))
        params_dev = params

    evaluator = COCOEvaluator()
    logger = MetricLogger()
    for batch in logger.log_every(dm.batches(), args.print_freq, header="Eval:"):
        n_img = batch["images"].shape[0]
        images = batch["images"]
        if images.shape[0] < args.batch_size:  # pad final partial batch
            pad = np.repeat(images[-1:], args.batch_size - n_img, axis=0)
            images = np.concatenate([images, pad], axis=0)
        det = jax.device_get(infer(params_dev, jnp.asarray(images)))
        preds, tgts = [], []
        for j in range(n_img):
            raw = batch["raw_targets"][j]
            n = int(det.num[j])
            oh, ow = (int(v) for v in raw["orig_size"])
            boxes = np.asarray(
                scale_coords_back(
                    jnp.asarray(det.boxes[j][:n]), (s, s), jnp.asarray([oh, ow], jnp.float32)
                )
            )
            preds.append({"boxes": boxes, "scores": np.asarray(det.scores[j][:n]),
                          "labels": np.asarray(det.labels[j][:n])})
            tgts.append({"boxes": raw["boxes"], "labels": raw["labels"],
                         "iscrowd": raw["iscrowd"], "area": raw["area"]})
        evaluator.update(preds, tgts)

    evaluator.synchronize_between_processes()
    results = evaluator.compute()
    for k, v in results.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    cli_main()
