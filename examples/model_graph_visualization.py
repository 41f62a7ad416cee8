#!/usr/bin/env python
"""Model-graph visualization walkthrough.

The reference ships this material as a notebook
(notebooks/model-graph-visualization.ipynb, built on TorchScript IR +
netron); the TPU-native analogs are JAX's own IRs — jaxpr (the traced
program), StableHLO (the portable exchange IR the AOT artifacts serialize),
and the XLA-optimized HLO (what actually runs, post-fusion) — plus a
graphviz dot rendering of the jaxpr dataflow.

    python examples/model_graph_visualization.py [--device cpu] [--out DIR]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--out", default=None)
    ap.add_argument("--size", type=int, default=160)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.utils.ir_visualizer import (
        JaxprVisualizer,
        cost_analysis,
        get_jaxpr,
        get_optimized_hlo,
        get_stablehlo,
    )

    out = _Path(args.out or tempfile.mkdtemp())
    out.mkdir(parents=True, exist_ok=True)

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=80,
                       pre_nms_topk=256, nms_tile_size=128)
    params = model.init(jax.random.PRNGKey(0))

    def forward(images):
        return model(params, images)

    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)

    # 1) jaxpr: the traced functional program (analog of TorchScript graph)
    jaxpr_text = get_jaxpr(forward, x)
    (out / "model.jaxpr.txt").write_text(jaxpr_text)
    print(f"== jaxpr: {len(jaxpr_text.splitlines())} lines -> {out}/model.jaxpr.txt")

    # 2) StableHLO: the exchange IR (what runtime/aot.py serializes; the
    #    analog of the exported ONNX graph)
    shlo = get_stablehlo(forward, x)
    (out / "model.stablehlo.mlir").write_text(shlo)
    print(f"== stablehlo: {len(shlo.splitlines())} lines -> {out}/model.stablehlo.mlir")

    # 3) optimized HLO: post-fusion, what the device executes (the analog
    #    of inspecting the TensorRT engine)
    hlo = get_optimized_hlo(forward, x)
    (out / "model.optimized.hlo.txt").write_text(hlo)
    n_fusion = sum("fusion" in l for l in hlo.splitlines())
    print(f"== optimized HLO: {len(hlo.splitlines())} lines, "
          f"{n_fusion} fusion mentions -> {out}/model.optimized.hlo.txt")

    # 4) compiler cost model: FLOPs / bytes the scheduler believes
    cost = cost_analysis(forward, x)
    flops = cost.get("flops", 0.0)
    print(f"== cost analysis: {flops/1e9:.2f} GFLOP "
          f"({ {k: round(v, 1) for k, v in sorted(cost.items())[:4]} } ...)")

    # 5) dataflow dot graph (render with `dot -Tsvg model.dot -o model.svg`
    #    where graphviz is installed)
    JaxprVisualizer(forward, x).save(str(out / "model.dot"))
    print(f"== dot graph -> {out}/model.dot")


if __name__ == "__main__":
    main()
