"""YAML model DSL: parse arbitrary ultralytics yaml configs, assemble
models, and generically ingest checkpoints whose layout the fixed index maps
cannot express (reference parse_model, v5/models/yolo.py:278-341)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_fixture import CUSTOM_YAML, make_custom_checkpoint
from yolort_tpu.models.yaml_model import (
    YAMLDetectionModel,
    build_yaml_config,
    load_yaml_from_ultralytics,
    parse_model,
)
from yolort_tpu.models.yolo import build_yolo


def test_parse_standard_matches_registry():
    """yaml-assembled yolov5n == registry model in feature-map shapes,
    strides, and anchor tables."""
    cfg = build_yaml_config("n", num_classes=7)
    m = YAMLDetectionModel(cfg)
    ref = build_yolo("yolov5_darknet_pan_n_r60", num_classes=7)
    assert m.strides == ref.strides
    assert m.anchor_grids == ref.anchor_grids
    params = m.init(jax.random.PRNGKey(0))
    rparams = ref.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 96, 128, 3))
    shapes = [o.shape for o in m.head_outputs(params, x)]
    rshapes = [o.shape for o in ref.head_outputs(rparams, x)]
    assert shapes == rshapes


def test_parse_p6_layout():
    cfg = build_yaml_config("s", p6=True, num_classes=3)
    m = YAMLDetectionModel(cfg)
    assert m.strides == (8, 16, 32, 64)
    assert len(m.anchor_grids) == 4
    params = m.init(jax.random.PRNGKey(0))
    outs = m.head_outputs(params, jnp.zeros((1, 128, 128, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_parse_depth_width_gains():
    """depth gain max(round(n*gd),1) and width make_divisible(c2*gw,8)
    (reference yolo.py:294-312)."""
    cfg = build_yaml_config("m", num_classes=80)  # gd=0.67, gw=0.75
    layers, save, meta = parse_model(cfg)
    # backbone row 2: n=3 -> round(3*0.67)=2 repeats inside C3
    c3 = layers[2].block
    assert len(c3.m) == 2
    # width: 128*0.75=96
    assert c3.c2 == 96
    assert meta["strides"] == (8, 16, 32)
    # savelist covers the skip connections
    assert {4, 6, 10, 14, 17, 20, 23} <= set(save)


def test_unsupported_module_raises():
    cfg = build_yaml_config("n")
    cfg["backbone"][0][2] = "TotallyUnknownBlock"
    with pytest.raises(ValueError, match="Unsupported yaml module"):
        parse_model(cfg)


@pytest.fixture(scope="module")
def custom_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "custom_fixture.pt"
    oracle = make_custom_checkpoint(str(path), nc=7, seed=5)
    return str(path), oracle


def test_custom_yaml_ingestion_decode_parity(custom_ckpt):
    """A non-standard checkpoint (extra C3, custom widths) converts through
    the yaml DSL and matches the torch oracle's decoded predictions — the
    layout the fixed index maps (models/_checkpoint.py:254-261) cannot
    express."""
    path, oracle = custom_ckpt
    m, params = load_yaml_from_ultralytics(path)
    assert m.num_classes == 7
    assert m.strides == (8, 16, 32)
    # params are keyed by the ultralytics flat index, including the extra C3
    assert "14" in params and "cv3" in params["14"]

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()  # (1, total, no) A-major

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = m.head_outputs(params, x_nhwc)
    pred = np.asarray(m.decode(params, x_nhwc))  # HWA-major

    na, no = 3, 12
    ref_reordered, off = [], 0
    for o in outs:
        h, w = o.shape[1:3]
        lvl = ref[:, off : off + na * h * w].reshape(1, na, h, w, no)
        ref_reordered.append(lvl.transpose(0, 2, 3, 1, 4).reshape(1, -1, no))
        off += na * h * w
    ref_hwa = np.concatenate(ref_reordered, axis=1)

    np.testing.assert_allclose(pred, ref_hwa, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(pred[..., 4:], ref_hwa[..., 4:], atol=2e-3)


def test_custom_model_full_pipeline(custom_ckpt):
    """End-to-end: yaml-ingested model runs the in-graph NMS postprocess."""
    path, _ = custom_ckpt
    m, params = load_yaml_from_ultralytics(path)
    from dataclasses import replace

    m = replace(m, score_thresh=1e-4, pre_nms_topk=256, nms_tile_size=64)
    det = m(params, jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 96, 3)),
                                jnp.float32))
    assert det.boxes.shape[0] == 1
    assert int(det.num[0]) >= 0
