#!/usr/bin/env python
"""Export an end-to-end serving artifact (serialized StableHLO + params).

CLI parity with the reference's tools/export_model.py:17-197, with the
ONNX/TensorRT backend zoo collapsed into one AOT artifact (see
yolort_tpu/runtime/aot.py).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path


def parse_args():
    ap = argparse.ArgumentParser("yolort_tpu model export")
    ap.add_argument("--checkpoint_path", required=True, help="ultralytics .pt or yolort_tpu .npz")
    ap.add_argument("--output_path", default=None, help="output artifact path (.ytpu)")
    ap.add_argument("--arch", default=None, help="arch name (required for .npz checkpoints)")
    ap.add_argument("--version", default="r6.0")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--image_size", type=int, nargs=2, default=[640, 640])
    ap.add_argument("--score_thresh", type=float, default=0.25)
    ap.add_argument("--nms_thresh", type=float, default=0.45)
    ap.add_argument("--detections_per_img", type=int, default=300)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    return ap.parse_args()


def cli_main():
    args = parse_args()
    import jax.numpy as jnp

    from yolort_tpu.models._checkpoint import load_from_ultralytics, load_params
    from yolort_tpu.models.yolo import YOLO, build_yolo
    from yolort_tpu.runtime import export_aot

    ckpt = Path(args.checkpoint_path)
    if ckpt.suffix == ".pt":
        info = load_from_ultralytics(str(ckpt), version=args.version)
        model = YOLO(
            depth_multiple=info["depth_multiple"],
            width_multiple=info["width_multiple"],
            version=args.version,
            num_classes=info["num_classes"],
            use_p6=info["use_p6"],
            strides=tuple(info["strides"]),
            anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
            score_thresh=args.score_thresh,
            nms_thresh=args.nms_thresh,
            detections_per_img=args.detections_per_img,
        )
        params = info["params"]
    else:
        params, meta = load_params(str(ckpt))
        if args.arch:
            model = build_yolo(
                args.arch,
                num_classes=meta.get("num_classes", 80),
                score_thresh=args.score_thresh,
                nms_thresh=args.nms_thresh,
            )
        else:
            raise SystemExit("--arch is required for .npz checkpoints")

    out = args.output_path or str(ckpt.with_suffix(".ytpu"))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    export_aot(
        model,
        params,
        out,
        batch_size=args.batch_size,
        input_hw=tuple(args.image_size),
        dtype=dtype,
        meta={"checkpoint": str(ckpt), "score_thresh": args.score_thresh},
    )
    print(f"exported: {out}")


if __name__ == "__main__":
    cli_main()
