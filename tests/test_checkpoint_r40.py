"""r4.0 legacy checkpoint conversion parity (Focus stem + SPP tail + C3
first-head-block layout, reference _checkpoint.py maps applied to the old
flat numbering)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO


@pytest.fixture(scope="module")
def ckpt40(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "fixture_r40.pt"
    oracle = make_checkpoint(str(path), nc=6, dm=0.33, wm=0.25, seed=8, version="r4.0")
    return str(path), oracle


def test_r40_decode_parity(ckpt40):
    path, oracle = ckpt40
    info = load_from_ultralytics(path, version="r4.0")
    assert info["use_p6"] is False
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r4.0",
        num_classes=6,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = model.head_outputs(info["params"], x_nhwc)
    pred = np.asarray(model.decode(info["params"], x_nhwc))

    na, no = 3, 11
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
