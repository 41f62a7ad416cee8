"""Tests for the full YOLOv5/SSD augmentation set (reference
v5/utils/augmentations.py:141-307 and yolort/data/transforms.py:114,276),
plus the focal-loss and hyp plumbing added for training fidelity."""

import numpy as np
import pytest

import yolort_tpu.data.transforms as T


def make_sample(h=64, w=96, boxes=None, labels=None):
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3), np.float32)
    boxes = np.asarray(boxes if boxes is not None else [[10, 10, 40, 40], [50, 20, 80, 50]],
                       np.float32)
    labels = np.asarray(labels if labels is not None else [1, 2], np.int64)
    tgt = {
        "boxes": boxes,
        "labels": labels,
        "area": ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])).astype(np.float32),
        "iscrowd": np.zeros(len(boxes), np.int64),
        "orig_size": np.asarray([h, w]),
    }
    return img, tgt


def test_bbox_ioa():
    box = np.asarray([0, 0, 10, 10], np.float32)
    others = np.asarray([[5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    ioa = T.bbox_ioa(box, others)
    np.testing.assert_allclose(ioa, [25 / 100, 0.0], atol=1e-6)


def test_random_perspective_identity():
    """All-zero geometric params leave image and boxes untouched (the
    center translation and the 0.5-translate recentre cancel)."""
    img, tgt = make_sample()
    t = T.RandomPerspective(degrees=0, translate=0, scale=0, shear=0, perspective=0, seed=0)
    out, tgt2 = t(img, tgt)
    np.testing.assert_allclose(out, img, atol=1e-5)
    np.testing.assert_allclose(tgt2["boxes"], tgt["boxes"], atol=1e-3)


def test_random_perspective_rotation_bounds():
    img, tgt = make_sample()
    t = T.RandomPerspective(degrees=30, translate=0.1, scale=0.5, shear=10,
                            perspective=0.0005, seed=3)
    out, tgt2 = t(img, tgt)
    assert out.shape == img.shape
    b = tgt2["boxes"]
    assert len(tgt2["labels"]) == len(b)
    if len(b):
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= img.shape[1]).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= img.shape[0]).all()
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_copy_paste_adds_mirrored_instances():
    img, tgt = make_sample(boxes=[[5, 5, 25, 25]], labels=[3])
    out, tgt2 = T.CopyPaste(p=1.0, seed=0)(img, tgt)
    assert len(tgt2["labels"]) == 2
    w = img.shape[1]
    x1, y1, x2, y2 = tgt["boxes"][0]
    np.testing.assert_allclose(tgt2["boxes"][1], [w - x2, y1, w - x1, y2])
    assert tgt2["labels"][1] == 3
    # the pasted pixels come from the mirrored image
    np.testing.assert_allclose(
        out[int(y1):int(y2), int(w - x2):int(w - x1)],
        img[:, ::-1][int(y1):int(y2), int(w - x2):int(w - x1)],
    )
    assert len(tgt2["area"]) == 2 and len(tgt2["iscrowd"]) == 2


def test_copy_paste_rejects_overlap():
    # the mirror position of a centered box overlaps itself -> no paste
    img, tgt = make_sample(w=64, boxes=[[16, 16, 48, 48]], labels=[0])
    out, tgt2 = T.CopyPaste(p=1.0, seed=0)(img, tgt)
    assert len(tgt2["labels"]) == 1
    np.testing.assert_allclose(out, img)


def test_cutout_changes_pixels_and_keeps_target_shapes():
    img, tgt = make_sample()
    out, tgt2 = T.Cutout(p=1.0, seed=0)(img, tgt)
    assert (out != img).any()
    assert len(tgt2["labels"]) == len(tgt2["boxes"]) <= 2


def test_random_iou_crop():
    img, tgt = make_sample()
    out, tgt2 = T.RandomIoUCrop(seed=1)(img, tgt)
    nh, nw = out.shape[:2]
    assert nh <= img.shape[0] and nw <= img.shape[1]
    b = tgt2["boxes"]
    assert len(b) >= 1
    assert (b[:, 0::2] <= nw + 1e-5).all() and (b[:, 1::2] <= nh + 1e-5).all()
    assert len(tgt2["labels"]) == len(b)


def test_random_photometric_distort():
    img, tgt = make_sample()
    out, _ = T.RandomPhotometricDistort(p=1.0, seed=0)(img, tgt)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert (out != img).any()


def test_vertical_flip():
    img, tgt = make_sample()
    out, tgt2 = T.RandomVerticalFlip(p=1.0, seed=0)(img, tgt)
    np.testing.assert_allclose(out, img[::-1])
    h = img.shape[0]
    np.testing.assert_allclose(tgt2["boxes"][:, 1], h - tgt["boxes"][:, 3])


def test_hyp_driven_stack():
    from yolort_tpu.trainer.hyp import DEFAULT_HYP, load_hyp

    hyp = load_hyp(None)
    assert hyp == DEFAULT_HYP
    stack = T.default_train_transforms(seed=0, hyp=dict(hyp, copy_paste=0.5, cutout=0.5))
    names = [type(t).__name__ for t in stack.transforms]
    assert names[0] == "CopyPaste" and names[-1] == "Cutout"
    img, tgt = make_sample()
    out, tgt2 = stack(img, tgt)
    assert out.ndim == 3 and len(tgt2["labels"]) == len(tgt2["boxes"])

    ssd = T.ssd_style_train_transforms(seed=0)
    out2, tgt3 = ssd(img, tgt)
    assert out2.ndim == 3 and len(tgt3["labels"]) == len(tgt3["boxes"])


def test_hyp_yaml_overlay(tmp_path):
    from yolort_tpu.trainer.hyp import load_hyp

    p = tmp_path / "hyp.yaml"
    p.write_text("fl_gamma: 1.5\nbox: 0.1\n")
    hyp = load_hyp(str(p))
    assert hyp["fl_gamma"] == 1.5 and hyp["box"] == 0.1
    assert hyp["cls"] == 0.5  # default preserved


def test_focal_loss_matches_reference_formula():
    """focal_bce_with_logits == BCE * alpha_t * (1-p_t)^gamma (reference
    v5/utils/loss.py:37-69), pinned against a direct numpy evaluation."""
    import jax.numpy as jnp

    from yolort_tpu.models.losses import bce_with_logits, focal_bce_with_logits

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, 8), jnp.float32)
    gamma, alpha = 1.5, 0.25

    got = np.asarray(focal_bce_with_logits(logits, targets, gamma, alpha))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    bce = np.asarray(bce_with_logits(logits, targets))
    p_t = t * p + (1 - t) * (1 - p)
    expect = bce * (t * alpha + (1 - t) * (1 - alpha)) * (1 - p_t) ** gamma
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # qfocal variant: |t - p|^gamma modulation (loss.py:72-97)
    got_q = np.asarray(focal_bce_with_logits(logits, targets, gamma, alpha, quality=True))
    expect_q = bce * (t * alpha + (1 - t) * (1 - alpha)) * np.abs(t - p) ** gamma
    np.testing.assert_allclose(got_q, expect_q, rtol=1e-5)


def test_task_hyp_plumbing():
    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.trainer import DefaultTask
    from yolort_tpu.trainer.hyp import load_hyp

    hyp = dict(load_hyp(None), box=0.07, cls=0.4, obj=0.9, fl_gamma=2.0, anchor_t=3.5)
    task = DefaultTask(build_yolo("yolov5_darknet_pan_n_r60", num_classes=3), hyp=hyp)
    assert task.loss.box_gain == 0.07
    assert task.loss.cls_gain == 0.4
    assert task.loss.obj_gain == 0.9
    assert task.loss.fl_gamma == 2.0
    assert task.loss.anchor_thresh == 3.5
    assert task.lr == hyp["lr0"] and task.momentum == hyp["momentum"]
    assert task.final_lr_frac == hyp["lrf"]
