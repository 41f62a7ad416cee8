"""Utils-layer tests: box converts (golden values, mirroring
test_v5_general.py), metrics (fitness/ap_per_class), autoanchor,
annotations converter, visualizer smoke."""

import json

import numpy as np
import pytest

from yolort_tpu.utils import boxes as B
from yolort_tpu.utils import metrics as M
from yolort_tpu.utils.autoanchor import check_anchor_order, check_anchors, kmean_anchors


def test_box_convert_roundtrip():
    xyxy = np.asarray([[10.0, 20.0, 50.0, 80.0], [0.0, 0.0, 4.0, 4.0]])
    xywh = B.xyxy2xywh(xyxy)
    np.testing.assert_allclose(xywh, [[30, 50, 40, 60], [2, 2, 4, 4]])
    np.testing.assert_allclose(B.xywh2xyxy(xywh), xyxy)


def test_xywhn2xyxy_with_pad():
    x = np.asarray([[0.5, 0.5, 0.5, 0.5]])
    out = B.xywhn2xyxy(x, w=100, h=200, padw=10, padh=20)
    np.testing.assert_allclose(out, [[35, 70, 85, 170]])


def test_clip_and_iou():
    b = np.asarray([[-5.0, -5.0, 50.0, 200.0]])
    np.testing.assert_allclose(B.clip_boxes(b, (100, 60)), [[0, 0, 50, 100]])
    a = np.asarray([[0, 0, 10, 10.0]])
    c = np.asarray([[5, 5, 15, 15.0], [20, 20, 30, 30.0]])
    iou = B.box_iou(a, c)
    np.testing.assert_allclose(iou, [[25 / 175, 0.0]], rtol=1e-6)


def test_wh_iou():
    w1 = np.asarray([[4.0, 4.0]])
    w2 = np.asarray([[2.0, 2.0], [4.0, 4.0]])
    np.testing.assert_allclose(B.wh_iou(w1, w2), [[4 / 16, 1.0]])


def test_fitness():
    m = np.asarray([[1.0, 1.0, 0.5, 0.4]])
    assert M.fitness(m)[0] == pytest.approx(0.1 * 0.5 + 0.9 * 0.4)


def test_ap_per_class_perfect():
    tp = np.ones((4, 1), bool)
    out = M.ap_per_class(tp, np.asarray([0.9, 0.8, 0.7, 0.6]), np.zeros(4), np.zeros(4))
    assert out["ap"][0, 0] == pytest.approx(1.0, abs=0.01)
    assert out["p"][0] == pytest.approx(1.0)
    assert out["r"][0] == pytest.approx(1.0)


def test_confusion_matrix():
    cm = M.ConfusionMatrix(nc=2)
    dets = np.asarray([[10, 10, 50, 50, 0.9, 0], [60, 60, 90, 90, 0.8, 1]])
    labels = np.asarray([[0, 10, 10, 50, 50], [0, 100, 100, 120, 120]])
    cm.process_batch(dets, labels)
    assert cm.matrix[0, 0] == 1  # correct class-0 match
    assert cm.matrix[1, 2] == 1  # class-1 det is background FP
    assert cm.matrix[2, 0] == 1  # second class-0 GT missed


def test_anchor_order_flips_reversed():
    grids = [(100, 100, 120, 120, 140, 140), (10, 10, 12, 12, 14, 14)]
    fixed = check_anchor_order(grids, [8, 16])
    assert fixed[0][0] < fixed[1][0]


def test_kmeans_anchors_fit():
    rng = np.random.default_rng(0)
    wh = np.concatenate([
        rng.normal(20, 2, (100, 2)), rng.normal(80, 5, (100, 2)), rng.normal(200, 10, (100, 2))
    ]).clip(2)
    anchors = kmean_anchors(wh, n=3, gen=100)
    assert anchors.shape == (3, 2)
    bpr, _ = check_anchors(wh, [tuple(anchors.reshape(-1))])
    assert bpr > 0.99
    # areas ascend
    areas = anchors.prod(1)
    assert (np.diff(areas) > 0).all()


def test_annotations_converter(tmp_path):
    import cv2

    imgd = tmp_path / "img"
    lbld = tmp_path / "lbl"
    imgd.mkdir(), lbld.mkdir()
    cv2.imwrite(str(imgd / "a.jpg"), np.zeros((100, 200, 3), np.uint8))
    (lbld / "a.txt").write_text("1 0.5 0.5 0.2 0.4\n")
    from yolort_tpu.utils.annotations_converter import AnnotationsConverter

    out = tmp_path / "out.json"
    coco = AnnotationsConverter(str(imgd), str(lbld), ["cat", "dog"]).generate(str(out))
    assert json.loads(out.read_text())["annotations"][0]["bbox"] == [80.0, 30.0, 40.0, 40.0]
    assert coco["categories"][1]["name"] == "dog"
    # round-trips through the dataset reader
    from yolort_tpu.data import COCODetection

    ds = COCODetection(str(imgd), str(out))
    _, tgt = ds[0]
    np.testing.assert_allclose(tgt["boxes"], [[80, 30, 120, 70]])
    assert tgt["labels"][0] == 1


def test_visualizer_smoke():
    from yolort_tpu.utils.visualizer import Visualizer

    img = np.zeros((50, 60, 3), np.float32)
    vis = Visualizer(img, metalabels=["thing"])
    out = vis.draw_instance_predictions(
        {"boxes": np.asarray([[5, 5, 30, 30]]), "scores": np.asarray([0.9]),
         "labels": np.asarray([0])}
    )
    assert out.dtype == np.uint8 and out.sum() > 0


def test_feature_extractor():
    import jax

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.utils.hooks import FeatureExtractor

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    params = model.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    feats = FeatureExtractor(model)(params, jnp.zeros((1, 64, 64, 3)))
    assert "backbone.0" in feats and "pan.0" in feats and "head.2" in feats
    assert feats["backbone.0"].shape == (1, 32, 32, 16)
