"""Letterbox numerics: my in-graph resize/pad must match the reference's
torch semantics (F.interpolate bilinear + centered pad, transform.py:53-97,
297-330), pinned against torch CPU as the oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from yolort_tpu.models.transform import (
    letterbox_batch,
    letterbox_image,
    letterbox_numpy,
    make_plan,
    resize_shape,
    scale_coords_back,
)


@pytest.mark.parametrize("hw", [(480, 640), (1080, 810), (333, 517)])
def test_resize_shape_matches_torch_floor(hw):
    h, w = hw
    scale = min(640.0 / min(h, w), 640.0 / max(h, w))
    rh, rw = resize_shape(h, w, 640, 640)
    assert rh == int(np.floor(h * scale)) and rw == int(np.floor(w * scale))


@pytest.mark.parametrize("hw", [(120, 160), (97, 143)])
def test_letterbox_resize_matches_torch_bilinear(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    plan = make_plan([(h, w)], min_size=96, max_size=96)[0]
    mine = np.asarray(letterbox_image(jnp.asarray(img), plan))
    rh, rw = plan.resized_hw

    # torch oracle: interpolate with recomputed scale == size-based bilinear
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    ref_resized = F.interpolate(t, size=(rh, rw), mode="bilinear", align_corners=False)
    ref_resized = ref_resized[0].numpy().transpose(1, 2, 0)
    dh, dw = plan.offset_hw
    np.testing.assert_allclose(
        mine[dh : dh + rh, dw : dw + rw], ref_resized, atol=2e-5
    )
    # pad region is fill color
    if dh > 0:
        np.testing.assert_allclose(mine[0], 114.0 / 255.0, atol=1e-6)


def test_pad_offsets_match_reference_rounding():
    # reference: dh = int(round((canvas - resized)/2 - 0.1)) (transform.py:318-326)
    plans = make_plan([(100, 200)], min_size=64, max_size=64, size_divisible=32)
    p = plans[0]
    rh, rw = p.resized_hw
    ch, cw = p.canvas_hw
    assert p.offset_hw[0] == int(round((ch - rh) / 2 - 0.1))
    assert p.offset_hw[1] == int(round((cw - rw) / 2 - 0.1))
    assert ch % 32 == 0 and cw % 32 == 0


def test_numpy_and_jax_letterbox_agree():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (77, 133, 3)).astype(np.float32)
    plan = make_plan([(77, 133)], 64, 64, fixed_shape=(64, 128))[0]
    a = np.asarray(letterbox_image(jnp.asarray(img), plan))
    b = letterbox_numpy(img, (64, 128), 64, 64)
    # cv2 INTER_LINEAR matches torch/jax half-pixel bilinear
    assert a.shape == b.shape == (64, 128, 3)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_scale_coords_back_reference_semantics():
    # gain/pad recomputed from sizes (reference transform.py:354-367)
    boxes = jnp.asarray([[100.0, 50.0, 300.0, 200.0]])
    canvas = (640, 640)
    orig = jnp.asarray([480.0, 640.0])
    out = np.asarray(scale_coords_back(boxes, canvas, orig))
    gain = min(640 / 480, 640 / 640)
    pad_x = (640 - 640 * gain) / 2
    pad_y = (640 - 480 * gain) / 2
    expect = [
        (100 - pad_x) / gain, (50 - pad_y) / gain,
        (300 - pad_x) / gain, (200 - pad_y) / gain,
    ]
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


def test_letterbox_batch_matches_single():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (3, 90, 120, 3)).astype(np.float32)
    plan = make_plan([(90, 120)], 64, 64)[0]
    batched = np.asarray(letterbox_batch(jnp.asarray(imgs), plan))
    for i in range(3):
        single = np.asarray(letterbox_image(jnp.asarray(imgs[i]), plan))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)
