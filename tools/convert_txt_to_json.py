#!/usr/bin/env python
"""YOLO-txt annotations -> COCO json (CLI parity with the reference's
tools/convert_txt_to_json.py)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse


def cli_main():
    ap = argparse.ArgumentParser("YOLO txt -> COCO json converter")
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--label_root", required=True)
    ap.add_argument("--class_names", required=True, help="comma-separated or a file with one name per line")
    ap.add_argument("--output_path", required=True)
    args = ap.parse_args()

    from pathlib import Path

    from yolort_tpu.utils.annotations_converter import AnnotationsConverter

    p = Path(args.class_names)
    names = (
        [l.strip() for l in p.read_text().splitlines() if l.strip()]
        if p.exists()
        else args.class_names.split(",")
    )
    AnnotationsConverter(args.image_root, args.label_root, names).generate(args.output_path)
    print(f"written: {args.output_path}")


if __name__ == "__main__":
    cli_main()
