"""Rich results object + LoadImages + new block tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _results():
    from yolort_tpu.utils.results import DetectionResults

    img = np.zeros((60, 80, 3), np.float32)
    preds = [{
        "boxes": np.asarray([[10.0, 10, 40, 40], [50, 20, 70, 50]]),
        "scores": np.asarray([0.9, 0.4]),
        "labels": np.asarray([0, 2]),
    }]
    return DetectionResults([img], preds, names=["person", "bicycle", "car"], files=["x.jpg"])


def test_results_summary_and_records():
    r = _results()
    s = r.summary()
    assert "1 person" in s and "1 car" in s and "x.jpg" in s
    rec = r.records()[0]
    assert rec[0]["name"] == "person" and rec[1]["class"] == 2
    assert rec[0]["confidence"] == pytest.approx(0.9)


def test_results_render_crop_save(tmp_path):
    r = _results()
    rendered = r.render()
    assert rendered[0].dtype == np.uint8 and rendered[0].sum() > 0
    crops = r.crop(save_dir=str(tmp_path / "crops"))
    assert len(crops) == 2 and crops[0]["im"].shape == (30, 30, 3)
    assert (tmp_path / "crops" / "person").exists()
    paths = r.save(str(tmp_path / "out"))
    import os

    assert os.path.exists(paths[0])


def test_load_images(tmp_path):
    import cv2

    for i in range(3):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"), np.zeros((20, 30, 3), np.uint8))
    (tmp_path / "notes.txt").write_text("skip me")
    from yolort_tpu.data.datasets import LoadImages

    loader = LoadImages(str(tmp_path))
    items = list(loader)
    assert len(items) == 3
    assert items[0][1].shape == (20, 30, 3) and items[0][1].dtype == np.float32
    with pytest.raises(FileNotFoundError):
        LoadImages(str(tmp_path / "missing"))


def test_predict_rich():
    import yolort_tpu

    m = yolort_tpu.yolov5n(num_classes=3, score_thresh=1e-6, pre_nms_topk=128, nms_tile_size=64)
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    res = m.predict_rich(img)
    assert len(res) == 1
    assert "image0" in res.summary() or "no detections" in res.summary() or res.summary()


@pytest.mark.parametrize("blk", ["ghostconv", "ghostbottleneck", "c3ghost", "dwconv", "classify"])
def test_extra_blocks(blk):
    from yolort_tpu.ops import blocks as B

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16))
    if blk == "ghostconv":
        m = B.GhostConv(16, 32)
        expect = (1, 16, 16, 32)
    elif blk == "ghostbottleneck":
        m = B.GhostBottleneck(16, 16, s=2)
        expect = (1, 8, 8, 16)
    elif blk == "c3ghost":
        m = B.C3Ghost(16, 32, n=2)
        expect = (1, 16, 16, 32)
    elif blk == "dwconv":
        m = B.DWConv(16, 16, 3)
        expect = (1, 16, 16, 16)
    else:
        m = B.Classify(16, 10)
        expect = (1, 10)
    p = m.init(jax.random.PRNGKey(1))
    assert m(p, x).shape == expect


def test_contract_expand_roundtrip():
    from yolort_tpu.ops.blocks import contract, expand

    x = jnp.arange(1 * 4 * 4 * 4.0).reshape(1, 4, 4, 4)
    c = contract(x, 2)
    assert c.shape == (1, 2, 2, 16)
    np.testing.assert_allclose(expand(c, 2), x)
