"""Native COCO evaluator tests: hand-computable AP cases."""

import numpy as np
import pytest

from yolort_tpu.data.coco_eval import COCOEvaluator, box_iou_xyxy


def det(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float32), "scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels)}


def gt(boxes, labels, iscrowd=None):
    out = {"boxes": np.asarray(boxes, np.float32), "labels": np.asarray(labels)}
    if iscrowd is not None:
        out["iscrowd"] = np.asarray(iscrowd, bool)
    return out


def test_perfect_detection():
    ev = COCOEvaluator()
    boxes = [[10, 10, 110, 110], [200, 200, 360, 360]]
    ev.update([det(boxes, [0.9, 0.8], [0, 1])], [gt(boxes, [0, 1])])
    r = ev.compute()
    assert r["AP"] == pytest.approx(1.0, abs=1e-6)
    assert r["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert r["AP75"] == pytest.approx(1.0, abs=1e-6)


def test_miss_and_false_positive():
    ev = COCOEvaluator()
    # one GT, one perfect det + one FP with higher score
    ev.update(
        [det([[500, 500, 600, 600], [10, 10, 110, 110]], [0.95, 0.9], [0, 0])],
        [gt([[10, 10, 110, 110]], [0])],
    )
    r = ev.compute()
    # precision at the recall point = 0.5 (TP ranked second)
    assert r["AP50"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_affects_high_iou():
    ev = COCOEvaluator()
    # det has IoU ~0.6 with GT: counts at IoU<=0.6 thresholds only
    ev.update(
        [det([[10, 10, 110, 110]], [0.9], [0])],
        [gt([[10, 10, 110, 90]], [0])],  # IoU = 80/120... compute below
    )
    iou = box_iou_xyxy(
        np.asarray([[10, 10, 110, 110.0]]), np.asarray([[10, 10, 110, 90.0]])
    )[0, 0]
    r = ev.compute()
    expected = np.mean(
        [1.0 if thr <= iou + 1e-9 else 0.0 for thr in np.round(np.arange(0.5, 1.0, 0.05), 2)]
    )
    assert r["AP"] == pytest.approx(expected, abs=0.01)
    assert r["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_class_confusion_is_false_positive():
    ev = COCOEvaluator()
    ev.update(
        [det([[10, 10, 110, 110]], [0.9], [1])],  # wrong class
        [gt([[10, 10, 110, 110]], [0])],
    )
    r = ev.compute()
    assert r["AP"] == pytest.approx(0.0, abs=1e-6)


def test_crowd_gt_absorbs_without_counting():
    ev = COCOEvaluator()
    # detection matching only a crowd GT: ignored (not FP), but recall stays 0
    ev.update(
        [det([[10, 10, 110, 110], [300, 300, 400, 400]], [0.9, 0.8], [0, 0])],
        [gt([[10, 10, 110, 110], [300, 300, 400, 400]], [0, 0], iscrowd=[True, False])],
    )
    r = ev.compute()
    # the non-crowd GT is matched by det2 -> AP 1.0 over 1 countable GT
    assert r["AP"] == pytest.approx(1.0, abs=1e-6)


def test_area_ranges():
    ev = COCOEvaluator()
    small = [10, 10, 30, 30]   # area 400 < 1024
    large = [0, 0, 200, 200]   # area 40000 > 9216
    ev.update(
        [det([small, large], [0.9, 0.8], [0, 0])],
        [gt([small, large], [0, 0])],
    )
    r = ev.compute()
    assert r["APs"] == pytest.approx(1.0, abs=1e-6)
    assert r["APl"] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(r["APm"])  # no medium GT


def test_multi_image_accumulation():
    ev = COCOEvaluator()
    b = [[10, 10, 110, 110]]
    ev.update([det(b, [0.9], [0])], [gt(b, [0])])
    ev.update([det([[500, 500, 550, 550]], [0.95], [0])], [gt(b, [0])])  # miss + FP
    r = ev.compute()
    # 2 GT, ranked dets: FP(0.95), TP(0.9) -> precision@recall0.5 = 0.5, max recall 0.5
    assert r["AP50"] == pytest.approx(np.mean([0.5 if t <= 0.5 else 0.0 for t in np.linspace(0, 1, 101)]), abs=0.02)


def test_sync_single_process_noop():
    ev = COCOEvaluator()
    b = [[10, 10, 110, 110]]
    ev.update([det(b, [0.9], [0])], [gt(b, [0])])
    ev.synchronize_between_processes()
    assert ev.compute()["AP"] == pytest.approx(1.0, abs=1e-6)


def _brute_force_match(ious, g_crowd, g_ignore, iou_thrs):
    """Literal pycocotools evaluateImg loop (the semantics oracle for the
    vectorized _greedy_match)."""
    n_d, n_g = ious.shape
    matched = np.zeros((len(iou_thrs), n_d), bool)
    mig = np.zeros((len(iou_thrs), n_d), bool)
    for ti, thr in enumerate(iou_thrs):
        g_used = np.zeros(n_g, bool)
        for di in range(n_d):
            best, best_iou = -1, float(thr)
            for gi in range(n_g):
                if g_used[gi] and not g_crowd[gi]:
                    continue
                if best > -1 and not g_ignore[best] and g_ignore[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                best = gi
            if best > -1:
                g_used[best] = True
                matched[ti, di] = True
                mig[ti, di] = g_ignore[best]
    return matched, mig


def test_greedy_match_equals_brute_force():
    """Vectorized matcher == literal pycocotools loop on randomized inputs,
    including crowds, ignores, and IoU ties."""
    from yolort_tpu.data.coco_eval import IOU_THRS

    rng = np.random.default_rng(0)
    for trial in range(30):
        n_d = int(rng.integers(0, 12))
        n_g = int(rng.integers(0, 10))
        # quantized IoUs to force ties
        ious = rng.integers(0, 12, (n_d, n_g)).astype(np.float64) / 12.0
        g_crowd = rng.random(n_g) < 0.25
        g_ignore = g_crowd | (rng.random(n_g) < 0.25)
        order = np.argsort(g_ignore, kind="stable")
        ious, g_crowd, g_ignore = ious[:, order], g_crowd[order], g_ignore[order]
        m1, i1 = COCOEvaluator._greedy_match(ious, g_crowd, g_ignore)
        m2, i2 = _brute_force_match(ious, g_crowd, g_ignore, IOU_THRS)
        np.testing.assert_array_equal(m1, m2, err_msg=f"trial {trial} matched")
        np.testing.assert_array_equal(i1, i2, err_msg=f"trial {trial} ignored")


def test_evaluator_speed_5k_images():
    """The vectorized evaluator must stay fast enough for val2017-scale runs
    (VERDICT r1: the per-(image,class,range) Python matcher was
    minutes-to-hours; budget here is well under a minute)."""
    import time

    rng = np.random.default_rng(0)
    ev = COCOEvaluator()
    n_img, nc = 5000, 80
    preds, tgts = [], []
    for _ in range(n_img):
        ng = int(rng.integers(1, 8))
        nd = int(rng.integers(1, 20))
        gb = rng.uniform(0, 500, (ng, 2))
        gboxes = np.concatenate([gb, gb + rng.uniform(8, 120, (ng, 2))], 1)
        glabels = rng.integers(0, nc, ng)
        # half the detections jitter real GT, half are noise
        j = rng.integers(0, ng, nd)
        dboxes = gboxes[j] + rng.normal(0, 8, (nd, 4))
        dlabels = np.where(rng.random(nd) < 0.8, glabels[j], rng.integers(0, nc, nd))
        preds.append(det(dboxes, rng.random(nd), dlabels))
        tgts.append(gt(gboxes, glabels))
    ev.update(preds, tgts)
    t0 = time.time()
    r = ev.compute()
    dt = time.time() - t0
    assert np.isfinite(r["AP"]) and 0.0 < r["AP"] < 1.0
    assert dt < 60.0, f"evaluator took {dt:.1f}s on 5k synthetic images"
