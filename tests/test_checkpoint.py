"""Checkpoint-conversion parity: ultralytics-layout .pt -> yolort_tpu params,
with numerical parity of decoded predictions against the torch oracle.

This replicates the intent of the reference's bit-parity integration test
(test/test_models.py:393-425) offline: no network, synthetic weights with
randomized BN stats, fp16 round-trip like real ultralytics checkpoints."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import (
    load_from_ultralytics,
    load_params,
    save_params,
)
from yolort_tpu.models.yolo import YOLO
from yolort_tpu.models.yolov5 import YOLOv5


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "yolov5_fixture.pt"
    oracle = make_checkpoint(str(path), nc=7, dm=0.33, wm=0.25, seed=3)
    return str(path), oracle


def test_load_from_ultralytics_metadata(ckpt):
    path, _ = ckpt
    info = load_from_ultralytics(path)
    assert info["num_classes"] == 7
    assert info["strides"] == [8, 16, 32]
    assert info["use_p6"] is False
    assert info["size"] == "n"
    np.testing.assert_allclose(
        np.asarray(info["anchor_grids"][0]), [10, 13, 16, 30, 33, 23], atol=0.1
    )
    # fused params: conv weights are HWIO with bias present
    w = info["params"]["backbone"]["0"]["w"]
    assert w.shape == (6, 6, 3, 16)
    assert "b" in info["params"]["backbone"]["0"]


def test_decode_parity_with_torch_oracle(ckpt):
    """Converted JAX model must match the torch fixture's decoded predictions
    (the reference pins this at rtol=0/atol=0 for real ckpts on identical
    backends; across frameworks we allow small float slack)."""
    path, oracle = ckpt
    info = load_from_ultralytics(path)
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r6.0",
        num_classes=info["num_classes"],
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()  # (1, total, no), A-major per level

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = model.head_outputs(info["params"], x_nhwc)
    pred = np.asarray(model.decode(info["params"], x_nhwc))  # (1, total, no), HWA order

    # reorder torch output per level from (na, h, w) to (h, w, na)
    na, no = 3, 12
    ref_reordered = []
    off = 0
    for o in outs:
        h, w = o.shape[1:3]
        lvl = ref[:, off : off + na * h * w].reshape(1, na, h, w, no)
        ref_reordered.append(lvl.transpose(0, 2, 3, 1, 4).reshape(1, -1, no))
        off += na * h * w
    ref_hwa = np.concatenate(ref_reordered, axis=1)

    np.testing.assert_allclose(pred, ref_hwa, rtol=2e-3, atol=2e-2)
    # scores (sigmoid outputs) should be tight
    np.testing.assert_allclose(pred[..., 4:], ref_hwa[..., 4:], atol=2e-3)


def test_yolov5_load_from_yolov5_end_to_end(ckpt):
    path, _ = ckpt
    m = YOLOv5.load_from_yolov5(path, score_thresh=1e-4, pre_nms_topk=512, nms_tile_size=64)
    img = np.random.default_rng(1).uniform(0, 1, (100, 150, 3)).astype(np.float32)
    preds = m.predict(img)
    assert len(preds) == 1
    assert set(preds[0]) == {"boxes", "scores", "labels"}
    assert (preds[0]["labels"] < 7).all()


def test_npz_roundtrip(ckpt, tmp_path):
    path, _ = ckpt
    info = load_from_ultralytics(path)
    out = str(tmp_path / "params.npz")
    meta_in = {"num_classes": info["num_classes"], "strides": info["strides"]}
    save_params(out, info["params"], meta_in)
    params, meta = load_params(out)
    assert meta == meta_in
    ref_leaves = jax.tree_util.tree_leaves(info["params"])
    got_leaves = jax.tree_util.tree_leaves(params)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
