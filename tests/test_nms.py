"""NMS correctness: the tiled fixed-point suppression must match a sequential
greedy reference (the semantics of torchvision.ops.nms, pinned for the
reference stack by deployment/ncnn/main.cpp:130-161)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolort_tpu.ops.nms import (
    batched_postprocess,
    box_iou_matrix,
    cxcywh_to_xyxy,
    greedy_nms_mask,
)


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(x[:, 3] - x[:, 1], 0, None)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def np_greedy_nms(boxes, valid, thr):
    """Plain sequential greedy NMS over score-sorted boxes."""
    k = len(boxes)
    alive = valid.copy()
    iou = np_iou(boxes, boxes)
    for i in range(k):
        if not alive[i]:
            continue
        for j in range(i + 1, k):
            if alive[j] and iou[i, j] > thr:
                alive[j] = False
    return alive


def random_boxes(rng, n, size=640.0):
    cxy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, 200, (n, 2))
    xyxy = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    return np.clip(xyxy, 0, size).astype(np.float32)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n,tile", [(100, 32), (333, 64), (1024, 256)])
def test_greedy_nms_matches_sequential(seed, n, tile):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, n)
    scores = np.sort(rng.uniform(0, 1, n))[::-1].astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1
    del scores  # boxes are already assumed score-sorted by construction
    ref = np_greedy_nms(boxes, valid, 0.45)
    got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.45, tile_size=tile))
    np.testing.assert_array_equal(got, ref)


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    got = np.asarray(box_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, np_iou(a, a), rtol=1e-6)


def test_cxcywh_to_xyxy():
    b = jnp.asarray([[10.0, 20.0, 4.0, 8.0]])
    np.testing.assert_allclose(cxcywh_to_xyxy(b)[0], [8, 16, 12, 24])


def _reference_postprocess(pred, num_classes, score_thresh, nms_thresh, max_det):
    """NumPy re-statement of the reference PostProcess.forward
    (box_head.py:388-429) for one image."""
    boxes = np.asarray(cxcywh_to_xyxy(jnp.asarray(pred[:, :4])))
    scores = pred[:, 5:] * pred[:, 4:5]
    anchor_idx, labels = np.where(scores > score_thresh)
    cand_scores = scores[anchor_idx, labels]
    cand_boxes = boxes[anchor_idx]
    order = np.argsort(-cand_scores, kind="stable")
    cand_boxes, cand_scores, labels = cand_boxes[order], cand_scores[order], labels[order]
    max_coord = cand_boxes.max() if len(cand_boxes) else 0.0
    off = cand_boxes + (labels * (max_coord + 1.0))[:, None]
    keep = np_greedy_nms(off, np.ones(len(off), bool), nms_thresh)
    idx = np.where(keep)[0][:max_det]
    return cand_boxes[idx], cand_scores[idx], labels[idx]


@pytest.mark.parametrize("seed", range(3))
def test_batched_postprocess_matches_reference(seed):
    rng = np.random.default_rng(100 + seed)
    na, nc = 500, 8
    pred = np.zeros((2, na, 5 + nc), np.float32)
    for b in range(2):
        xyxy = random_boxes(rng, na)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        w = xyxy[:, 2] - xyxy[:, 0]
        h = xyxy[:, 3] - xyxy[:, 1]
        pred[b, :, :4] = np.stack([cx, cy, w, h], 1)
        pred[b, :, 4] = rng.uniform(0, 1, na)
        pred[b, :, 5:] = rng.uniform(0, 1, (na, nc))

    out = batched_postprocess(
        jnp.asarray(pred), num_classes=nc, score_thresh=0.4, nms_thresh=0.5,
        detections_per_img=100, pre_nms_topk=1024, nms_tile_size=128,
    )
    for b in range(2):
        rb, rs, rl = _reference_postprocess(pred[b], nc, 0.4, 0.5, 100)
        n = int(out.num[b])
        assert n == len(rb)
        np.testing.assert_allclose(np.asarray(out.scores[b][:n]), rs, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.labels[b][:n]), rl)
        np.testing.assert_allclose(np.asarray(out.boxes[b][:n]), rb, rtol=1e-5)
        # padding is zeroed
        assert not np.any(np.asarray(out.valid[b][n:]))


def test_postprocess_empty():
    pred = np.zeros((1, 100, 5 + 4), np.float32)  # all scores 0
    out = batched_postprocess(jnp.asarray(pred), num_classes=4, score_thresh=0.25,
                              nms_thresh=0.45, detections_per_img=10, pre_nms_topk=64)
    assert int(out.num[0]) == 0
    assert not np.any(np.asarray(out.valid[0]))


def test_select_topk_threshold_matches_lax_topk():
    """bisect-select == masked lax.top_k: same selected set, same values,
    same descending order (ties may permute within equal values)."""
    import numpy as np

    from yolort_tpu.ops.nms import select_topk_threshold

    rng = np.random.default_rng(0)
    for trial, (n, k, thr) in enumerate(
        [(1000, 64, 0.005), (4096, 512, 0.25), (8192, 4096, 0.005), (333, 64, 0.0)]
    ):
        flat = jnp.asarray(rng.uniform(0, 1.0, n).astype(np.float32) ** 4)
        bv, bi = jax.jit(lambda f: select_topk_threshold(f, k, thr))(flat)
        rv, ri = jax.jit(lambda f: jax.lax.top_k(jnp.where(f > thr, f, -1.0), k))(flat)
        bv, bi, rv, ri = map(np.asarray, (bv, bi, rv, ri))
        okb, okr = bv > thr, rv > thr
        assert (okb.sum() == okr.sum()), f"trial {trial} count"
        np.testing.assert_array_equal(np.where(okb, bv, -1), np.where(okr, rv, -1),
                                      err_msg=f"trial {trial} values")
        assert set(bi[okb].tolist()) == set(ri[okr].tolist()), f"trial {trial} indices"


def test_select_topk_threshold_ties():
    """Quantized scores force >k-way ties at the boundary; strictly-greater
    entries must never be displaced by tie entries."""
    import numpy as np

    from yolort_tpu.ops.nms import select_topk_threshold

    rng = np.random.default_rng(1)
    n, k = 2048, 256
    flat = jnp.asarray((rng.integers(0, 5, n) / 5.0).astype(np.float32))
    bv, bi = jax.jit(lambda f: select_topk_threshold(f, k, 0.05))(flat)
    rv, _ = jax.jit(lambda f: jax.lax.top_k(jnp.where(f > 0.05, f, -1.0), k))(flat)
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
    # all strictly-greater-than-boundary entries present
    fv = np.asarray(flat)
    boundary = np.asarray(rv)[k - 1]
    must_have = np.flatnonzero(fv > boundary)
    assert set(must_have.tolist()) <= set(np.asarray(bi).tolist())


def test_select_topk_threshold_fewer_than_k():
    import numpy as np

    from yolort_tpu.ops.nms import select_topk_threshold

    flat = jnp.asarray(np.asarray([0.9, 0.001, 0.7, 0.0005, 0.3], np.float32))
    v, i = jax.jit(lambda f: select_topk_threshold(f, 4, 0.01))(flat)
    np.testing.assert_allclose(np.asarray(v), [0.9, 0.7, 0.3, -1.0])
    assert np.asarray(i)[:3].tolist() == [0, 2, 4]


def test_postprocess_bisect_matches_topk_impl():
    """Full postprocess with topk_impl='bisect' == 'topk' on identical
    decoded predictions."""
    import numpy as np

    rng = np.random.default_rng(3)
    b, na, nc = 2, 840, 7
    pred = np.zeros((b, na, 5 + nc), np.float32)
    pred[..., 0] = rng.uniform(0, 640, (b, na))
    pred[..., 1] = rng.uniform(0, 640, (b, na))
    pred[..., 2] = rng.uniform(8, 120, (b, na))
    pred[..., 3] = rng.uniform(8, 120, (b, na))
    pred[..., 4] = rng.uniform(0, 1, (b, na))
    pred[..., 5:] = rng.uniform(0, 1, (b, na, nc))
    pred = jnp.asarray(pred)

    kw = dict(num_classes=nc, score_thresh=0.25, nms_thresh=0.45,
              detections_per_img=100, pre_nms_topk=256, nms_tile_size=64,
              nms_impl="xla")
    d1 = jax.jit(lambda p: batched_postprocess(p, topk_impl="topk", **kw))(pred)
    d2 = jax.jit(lambda p: batched_postprocess(p, topk_impl="bisect", **kw))(pred)
    np.testing.assert_array_equal(np.asarray(d1.num), np.asarray(d2.num))
    np.testing.assert_allclose(np.asarray(d1.scores), np.asarray(d2.scores), atol=0)
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d2.boxes), atol=0)
    np.testing.assert_array_equal(np.asarray(d1.labels), np.asarray(d2.labels))
