"""r3.1 legacy checkpoint conversion parity (BottleneckCSP blocks, Hardswish
convs, LeakyReLU CSP gate)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO


def test_r31_decode_parity(tmp_path):
    path = str(tmp_path / "fixture_r31.pt")
    oracle = make_checkpoint(path, nc=4, dm=0.33, wm=0.25, seed=12, version="r3.1")
    info = load_from_ultralytics(path, version="r3.1")
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r3.1",
        num_classes=4,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    # unfused BN survives in the CSP gate position
    inner0 = info["params"]["pan"]["inner"]["0"]
    assert {"cv1", "cv2", "cv3", "cv4", "bn", "m"} <= set(inner0)
    assert "gamma" in inner0["bn"]

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = model.head_outputs(info["params"], x_nhwc)
    pred = np.asarray(model.decode(info["params"], x_nhwc))

    na, no = 3, 9
    ref_reordered = []
    off = 0
    for o in outs:
        h, w = o.shape[1:3]
        lvl = ref[:, off : off + na * h * w].reshape(1, na, h, w, no)
        ref_reordered.append(lvl.transpose(0, 2, 3, 1, 4).reshape(1, -1, no))
        off += na * h * w
    ref_hwa = np.concatenate(ref_reordered, axis=1)
    np.testing.assert_allclose(pred, ref_hwa, rtol=2e-3, atol=3e-2)
    np.testing.assert_allclose(pred[..., 4:], ref_hwa[..., 4:], atol=2e-3)
