"""TAN (C3TR transformer) checkpoint conversion parity — exercises the
MultiheadAttention flattening in the generic converter and the
TransformerLayer numerics against torch."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.torch_fixture import FTransformerLayer, make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import build_yolo


def test_transformer_layer_matches_torch():
    """My TransformerLayer must reproduce torch's MultiheadAttention-based
    layer exactly (same weights)."""
    import jax

    from yolort_tpu.ops.blocks import TransformerLayer

    torch.manual_seed(0)
    c, heads, L, N = 16, 4, 6, 2
    t_layer = FTransformerLayer(c, heads).eval()

    params = {
        "q": {"w": jnp.asarray(t_layer.q.weight.detach().numpy().T)},
        "k": {"w": jnp.asarray(t_layer.k.weight.detach().numpy().T)},
        "v": {"w": jnp.asarray(t_layer.v.weight.detach().numpy().T)},
        "in_proj_w": jnp.asarray(t_layer.ma.in_proj_weight.detach().numpy()),
        "in_proj_b": jnp.asarray(t_layer.ma.in_proj_bias.detach().numpy()),
        "out_proj": {
            "w": jnp.asarray(t_layer.ma.out_proj.weight.detach().numpy().T),
            "b": jnp.asarray(t_layer.ma.out_proj.bias.detach().numpy()),
        },
        "fc1": {"w": jnp.asarray(t_layer.fc1.weight.detach().numpy().T)},
        "fc2": {"w": jnp.asarray(t_layer.fc2.weight.detach().numpy().T)},
    }
    x = np.random.default_rng(0).normal(size=(L, N, c)).astype(np.float32)
    with torch.no_grad():
        ref = t_layer(torch.from_numpy(x)).numpy()
    mine = np.asarray(TransformerLayer(c, heads)(params, jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ckpt_tan(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "fixture_tan.pt"
    oracle = make_checkpoint(str(path), nc=6, dm=0.33, wm=0.25, seed=2, version="tan")
    return str(path), oracle


def test_tan_decode_parity(ckpt_tan):
    path, oracle = ckpt_tan
    info = load_from_ultralytics(path, version="r4.0")
    model = build_yolo(
        "yolov5_darknet_tan_s_r40",
        num_classes=6,
    )
    # override size multiples to the fixture's nano scale
    from yolort_tpu.models.yolo import YOLO

    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        version="r4.0",
        num_classes=6,
        use_tan=True,
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    # converter must have produced the C3TR attention params under inner.0
    inner0 = info["params"]["pan"]["inner"]["0"]
    assert "m" in inner0 and "tr" in inner0["m"]
    assert "in_proj_w" in inner0["m"]["tr"]["0"]

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
