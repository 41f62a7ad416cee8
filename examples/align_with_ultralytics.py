#!/usr/bin/env python
"""How to align with ultralytics/yolov5 checkpoints.

The reference documents this in notebooks/how-to-align-with-ultralytics-
yolov5.ipynb (load an upstream checkpoint, convert, verify the outputs
match).  Runnable offline form: fabricate an ultralytics-LAYOUT checkpoint
with the test fixture (real torch module tree pickled exactly like
upstream saves it), convert it through ``YOLOv5.load_from_yolov5``, and
verify the converted JAX model reproduces the torch oracle's raw head
outputs.

With a REAL yolov5 checkpoint on disk, skip the fabrication step and point
--ckpt at it — the conversion path is identical
(models/_checkpoint.py: stub unpickler, BN fold, index maps).

    python examples/align_with_ultralytics.py [--ckpt path.pt] [--size 320]
"""

import sys as _sys
from pathlib import Path as _Path

_REPO = _Path(__file__).resolve().parent.parent
_sys.path.insert(0, str(_REPO))
_sys.path.insert(0, str(_REPO / "tests"))

import argparse
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="existing ultralytics checkpoint (default: fabricate one)")
    ap.add_argument("--size", type=int, default=320)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    oracle = None
    if args.ckpt is None:
        from torch_fixture import make_checkpoint

        path = str(_Path(tempfile.mkdtemp()) / "yolov5n_fixture.pt")
        oracle = make_checkpoint(path, nc=80, dm=0.33, wm=0.25, seed=7)
        print(f"== fabricated ultralytics-layout checkpoint: {path}")
    else:
        path = args.ckpt

    # 1) convert: stub unpickler reads the torch module tree without
    #    executing upstream code, folds BN into convs, and maps every
    #    tensor into the functional JAX param tree
    from yolort_tpu.models import YOLOv5

    model = YOLOv5.load_from_yolov5(path, size=(args.size, args.size),
                                    score_thresh=1e-3)
    print(f"== converted: nc={model.model.num_classes}, "
          f"strides={model.model.strides}")

    # 2) run the converted model on a deterministic image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (args.size, args.size, 3), np.uint8)
    dets = model.predict(img.astype(np.float32) / 255.0)[0]
    print(f"== detections: {len(dets['boxes'])} "
          f"(top score {float(dets['scores'][0]):.4f})" if len(dets["boxes"])
          else "== detections: none above threshold")

    # 3) alignment check vs the torch oracle (fabricated path only): the
    #    DECODED predictions must agree to float tolerance — the same
    #    contract the test suite pins (tests/test_checkpoint.py:48; the
    #    reference pins rtol=0/atol=0 for real ckpts on identical backends,
    #    reference test/test_models.py:393-425)
    if oracle is not None:
        import torch

        x = img.astype(np.float32) / 255.0
        x_nchw = torch.from_numpy(x[None]).permute(0, 3, 1, 2).contiguous()
        with torch.no_grad():
            ref = oracle(x_nchw).numpy()  # (1, total, no), anchor-major per level
        x_nhwc = jnp.asarray(x[None], jnp.float32)
        outs = model.model.head_outputs(model.params, x_nhwc)
        pred = np.asarray(model.model.decode(model.params, x_nhwc))  # HWA order

        na, no = model.model.num_anchors, 5 + model.model.num_classes
        ref_hwa, off = [], 0
        for o in outs:  # reorder torch (na, h, w) -> (h, w, na) per level
            h, w = o.shape[1:3]
            lvl = ref[:, off: off + na * h * w].reshape(1, na, h, w, no)
            ref_hwa.append(lvl.transpose(0, 2, 3, 1, 4).reshape(1, -1, no))
            off += na * h * w
        ref_hwa = np.concatenate(ref_hwa, axis=1)
        worst = float(np.max(np.abs(pred - ref_hwa)))
        print(f"== decoded-prediction parity vs torch oracle: max|diff| = {worst:.2e}")
        np.testing.assert_allclose(pred, ref_hwa, rtol=2e-3, atol=2e-2)
        print("== ALIGNED")


if __name__ == "__main__":
    main()
