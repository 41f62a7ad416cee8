"""Anchor-match visualization: the python matcher must agree with the jitted
loss's candidate lattice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.models.head import DEFAULT_ANCHOR_GRIDS, DEFAULT_STRIDES
from yolort_tpu.utils.anchor_viz import anchor_match_visualize, compute_anchor_matches


def test_matches_center_cell_always_included():
    boxes = np.asarray([[0.5, 0.5, 0.2, 0.2]])
    matches = compute_anchor_matches(boxes, DEFAULT_STRIDES, DEFAULT_ANCHOR_GRIDS, (640, 640))
    assert len(matches) == 3
    # at least one level matched, and each match includes the center cell
    total = sum(len(l) for l in matches)
    assert total > 0
    for stride, level in zip(DEFAULT_STRIDES, matches):
        gw = 640 // stride
        center = (int(0.5 * gw), int(0.5 * gw))
        for m in level:
            assert 0 <= m["cell"][0] < gw and 0 <= m["cell"][1] < gw
        if level:
            assert any(m["cell"] == center for m in level)


@pytest.mark.slow
def test_matches_agree_with_loss_lattice():
    """Count parity with the YOLOLoss candidate mask for one target."""
    from yolort_tpu.models.losses import YOLOLoss
    from yolort_tpu.models.yolo import build_yolo

    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    outs = model.head_outputs(params, x)

    box = np.asarray([[0.53, 0.41, 0.25, 0.3]])
    matches = compute_anchor_matches(box, model.strides, model.anchor_grids, (128, 128))
    py_counts = [len(l) for l in matches]

    # reproduce the loss's per-level candidate counts
    loss = YOLOLoss(strides=model.strides, anchor_grids=model.anchor_grids, num_classes=2)
    targets = jnp.asarray([[[0.0, 0.53, 0.41, 0.25, 0.3]]])
    mask = jnp.asarray([[True]])
    # instrument: rebuild the lattice the same way the loss does
    jit_counts = []
    for out, stride, ag in zip(outs, loss.strides, loss.anchor_grids):
        b, h, w, _ = out.shape
        anchors = np.asarray(ag, np.float64).reshape(-1, 2) / stride
        gxy = np.asarray([0.53 * w, 0.41 * h])
        gwh = np.asarray([0.25 * w, 0.3 * h])
        r = gwh[None, :] / anchors
        match = np.max(np.maximum(r, 1.0 / r), axis=-1) < loss.anchor_thresh
        fx, fy = gxy[0] % 1.0, gxy[1] % 1.0
        n_off = 1
        n_off += int(fx < 0.5 and gxy[0] > 1.0)
        n_off += int(fy < 0.5 and gxy[1] > 1.0)
        n_off += int((w - gxy[0]) % 1.0 < 0.5 and (w - gxy[0]) > 1.0)
        n_off += int((h - gxy[1]) % 1.0 < 0.5 and (h - gxy[1]) > 1.0)
        jit_counts.append(int(match.sum()) * n_off)
    assert py_counts == jit_counts


def test_visualize_renders(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (128, 128, 3)).astype(np.float32)
    boxes = np.asarray([[0.5, 0.5, 0.3, 0.3]])
    outs = anchor_match_visualize(img, boxes, np.asarray([1]),
                                  DEFAULT_STRIDES, DEFAULT_ANCHOR_GRIDS)
    assert len(outs) == 3
    assert all(o.shape == (128, 128, 3) and o.dtype == np.uint8 for o in outs)
