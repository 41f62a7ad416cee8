"""TTA inference + pruning tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolort_tpu.models.tta import scale_img, tta_inference
from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.utils.prune import prune, sparsity


def test_scale_img_shapes():
    x = jnp.zeros((1, 64, 96, 3))
    y = scale_img(x, 0.67, stride=32)
    nh, nw = int(64 * 0.67), int(96 * 0.67)
    assert y.shape == (1, nh + (-nh % 32), nw + (-nw % 32), 3)
    assert scale_img(x, 1.0) is x


@pytest.mark.slow
def test_tta_recovers_same_objects():
    """TTA variants of the identity scale must map back onto the base-frame
    predictions (flip + unscale round trip)."""
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4,
                       score_thresh=1e-5, pre_nms_topk=256, nms_tile_size=64)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))

    base = model(params, x)
    det = tta_inference(model, params, x, scales=(1.0,), flips=(False,))
    # single identity variant == plain inference
    n = int(base.num[0])
    assert int(det.num[0]) == n
    np.testing.assert_allclose(
        np.asarray(det.boxes[0][:n]), np.asarray(base.boxes[0][:n]), atol=1e-4
    )

    # full TTA pools more candidates but stays in-frame and sorted
    det3 = tta_inference(model, params, x)
    n3 = int(det3.num[0])
    assert n3 >= 1
    s = np.asarray(det3.scores[0][:n3])
    assert (s[:-1] >= s[1:]).all()


def test_tta_flip_only_consistency():
    """A flipped-only variant of a horizontally symmetric input must produce
    (near-)identical detections to the unflipped one."""
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4,
                       score_thresh=1e-5, pre_nms_topk=256, nms_tile_size=64)
    params = model.init(jax.random.PRNGKey(0))
    half = jax.random.uniform(jax.random.PRNGKey(2), (1, 96, 48, 3))
    x = jnp.concatenate([half, half[:, :, ::-1, :]], axis=2)  # symmetric

    d_plain = tta_inference(model, params, x, scales=(1.0,), flips=(False,))
    d_flip = tta_inference(model, params, x, scales=(1.0,), flips=(True,))
    assert abs(int(d_plain.num[0]) - int(d_flip.num[0])) <= 2


def test_prune_and_sparsity():
    model = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    params = model.init(jax.random.PRNGKey(0))
    assert sparsity(params) < 0.01
    pruned = prune(params, amount=0.3)
    s = sparsity(pruned)
    assert 0.2 < s < 0.4
    # model still runs
    x = jnp.zeros((1, 64, 64, 3))
    outs = model.head_outputs(pruned, x)
    assert outs[0].shape[0] == 1
