"""P6 checkpoint conversion parity: validates the 4-level flat-index maps
(reference _checkpoint.py:54-57) against a torch P6 oracle."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO


@pytest.fixture(scope="module")
def ckpt6(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "fixture_p6.pt"
    oracle = make_checkpoint(str(path), nc=5, dm=0.33, wm=0.25, seed=4, p6=True)
    return str(path), oracle


def test_p6_metadata(ckpt6):
    path, _ = ckpt6
    info = load_from_ultralytics(path)
    assert info["use_p6"] is True
    assert info["strides"] == [8, 16, 32, 64]
    assert "p6" in info["params"]["pan"]
    assert set(info["params"]["pan"]["inner"]) == {"0", "1", "3", "4", "6", "7"}
    assert set(info["params"]["pan"]["layer"]) == {"0", "1", "2", "3", "4", "5", "6"}
    assert len(info["params"]["head"]) == 4


def test_p6_decode_parity(ckpt6):
    path, oracle = ckpt6
    info = load_from_ultralytics(path)
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r6.0",
        num_classes=5,
        use_p6=True,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = model.head_outputs(info["params"], x_nhwc)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    pred = np.asarray(model.decode(info["params"], x_nhwc))

    na, no = 3, 10
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
