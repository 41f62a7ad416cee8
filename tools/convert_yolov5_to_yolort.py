#!/usr/bin/env python
"""Convert an ultralytics/yolov5 checkpoint to the yolort_tpu npz format.

CLI parity with the reference's tools/convert_yolov5_to_yolort.py."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path


def cli_main():
    ap = argparse.ArgumentParser("ultralytics -> yolort_tpu checkpoint converter")
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--output_path", default=".")
    ap.add_argument("--version", default="r6.0", choices=["r3.1", "r4.0", "r6.0"])
    args = ap.parse_args()

    from yolort_tpu.models._checkpoint import convert_yolov5_checkpoint

    out = convert_yolov5_checkpoint(args.checkpoint_path, args.output_path, version=args.version)
    print(f"converted: {out}")


if __name__ == "__main__":
    cli_main()
