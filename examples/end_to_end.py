#!/usr/bin/env python
"""End-to-end walkthrough: inference, training, quantization, export.

The reference ships this material as notebooks (notebooks/*.ipynb); this is
the runnable script form.  Uses synthetic data so it works offline.

    python examples/end_to_end.py [--device cpu]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    args = ap.parse_args()
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np

    tmp = tempfile.mkdtemp()
    print(f"== workspace: {tmp}")

    # 1) fabricate a small dataset -----------------------------------------
    from yolort_tpu.data._helper import create_synthetic_coco

    img_dir, ann_file = create_synthetic_coco(tmp, num_images=8, num_classes=3,
                                              image_hw=(160, 160))
    print("== dataset:", img_dir)

    # 2) inference with a fresh model --------------------------------------
    from yolort_tpu.models import YOLOv5

    model = YOLOv5(arch="yolov5_darknet_pan_n_r60", num_classes=3,
                   score_thresh=1e-4, size=(160, 160),
                   pre_nms_topk=256, nms_tile_size=128)
    from yolort_tpu.data.datasets import LoadImages

    frames = [im for _, im in LoadImages(img_dir)]
    rich = model.predict_rich(frames[:2])
    print("== predictions:")
    rich.print()

    # 3) a few training steps ----------------------------------------------
    from yolort_tpu.data import COCODetection, DetectionDataModule
    from yolort_tpu.trainer import DefaultTask, make_train_step

    ds = COCODetection(img_dir, ann_file)
    dm = DetectionDataModule(ds, batch_size=8, canvas_hw=(160, 160),
                             min_size=160, max_size=160)
    task = DefaultTask(model.model, lr=0.02)
    state = task.init_state(jax.random.PRNGKey(0))
    step = make_train_step(task)
    for batch in dm.batches():
        for _ in range(5):
            state, metrics = step(state, jnp.asarray(batch["images"]),
                                  jnp.asarray(batch["targets"]),
                                  jnp.asarray(batch["target_mask"]))
    print(f"== trained 5 steps, loss {float(metrics['total']):.4f}")

    # 4) quantize + evaluate ------------------------------------------------
    from yolort_tpu.ops.quantization import dequantize_params, quantize_params

    qparams = dequantize_params(quantize_params(state.params), jnp.float32)
    from yolort_tpu.trainer.fit import evaluate

    results = evaluate(model.model, qparams, dm, (160, 160))
    print("== eval (quantized):", {k: round(v, 4) for k, v in results.items()})

    # 5) export a serving artifact -------------------------------------------
    from yolort_tpu.runtime import export_aot, load_aot

    art = f"{tmp}/model.ytpu"
    export_aot(model.model, state.params, art, batch_size=4, input_hw=(160, 160),
               dtype=jnp.float32)
    pred = load_aot(art)
    raw = (np.stack(frames[:4]) * 255).astype(np.uint8)
    outs = pred.predict(raw)
    print(f"== served {len(outs)} frames from the artifact; "
          f"dets: {[len(o['boxes']) for o in outs]}")
    print("done.")


if __name__ == "__main__":
    main()
