"""Full-size (640x640, nc=80, yolov5s widths) synthetic-oracle parity — the
scale the reference's real-checkpoint integration tests run at
(test/test_models.py:393-425), executable without seeded weights.  Plus the
turnkey regression harness (tools/regression.py) driven on fixtures."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models._checkpoint import load_from_ultralytics
from yolort_tpu.models.yolo import YOLO


@pytest.mark.slow
def test_fullsize_s_model_decode_parity(tmp_path):
    """yolov5s-size model at 640x640 with nc=80: converted JAX decode matches
    the torch oracle end-to-end (scores tight, boxes to float slack)."""
    path = str(tmp_path / "yolov5s_fullsize.pt")
    oracle = make_checkpoint(path, nc=80, dm=0.33, wm=0.5, seed=7)
    info = load_from_ultralytics(path)
    assert info["size"] == "s" and info["num_classes"] == 80
    model = YOLO(
        depth_multiple=info["depth_multiple"],
        width_multiple=info["width_multiple"],
        num_classes=info["num_classes"],
        strides=tuple(info["strides"]),
        anchor_grids=tuple(tuple(a) for a in info["anchor_grids"]),
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 640, 640)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = model.head_outputs(info["params"], x_nhwc)
    pred = np.asarray(model.decode(info["params"], x_nhwc))

    na, no = 3, 85
    ref_reordered, off = [], 0
    for o in outs:
        h, w = o.shape[1:3]
        lvl = ref[:, off : off + na * h * w].reshape(1, na, h, w, no)
        ref_reordered.append(lvl.transpose(0, 2, 3, 1, 4).reshape(1, -1, no))
        off += na * h * w
    ref_hwa = np.concatenate(ref_reordered, axis=1)

    assert pred.shape == ref_hwa.shape == (1, 25200, 85)
    np.testing.assert_allclose(pred, ref_hwa, rtol=2e-3, atol=5e-2)
    np.testing.assert_allclose(pred[..., 4:], ref_hwa[..., 4:], atol=2e-3)


@pytest.mark.slow
def test_regression_harness_bit_parity(tmp_path):
    """tools/regression.py check 1: both ingestion paths decode bit-exactly
    (the reference's rtol=0/atol=0 contract, test_models.py:423-425)."""
    import importlib.util

    path = str(tmp_path / "yolov5n_reg.pt")
    make_checkpoint(path, nc=80, dm=0.33, wm=0.25, seed=2)
    spec = importlib.util.spec_from_file_location(
        "regression", "tools/regression.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.check_bit_parity(path, img_size=256)
    assert report["bit_parity"] == "exact"
    assert report["max_delta"] == 0.0


@pytest.mark.slow
def test_regression_selftest_cli(tmp_path):
    """tools/regression.py --selftest end-to-end (VERDICT r2 item 9): the
    whole CLI path — fixture ckpt fabrication, coco128-shaped dataset,
    txt->json conversion, dual-path ingestion bit-parity, eval loop, floor
    check — must run green before the day real weights/data appear."""
    import json as _json
    import subprocess
    import sys as _s

    work = tmp_path / "selftest"
    work.mkdir()
    proc = subprocess.run(
        [_s.executable, "tools/regression.py", "--selftest",
         "--selftest-dir", str(work), "--device", "cpu"],
        capture_output=True, text=True, timeout=560,
        cwd=str(pytest.importorskip("yolort_tpu").__path__[0] + "/.."),
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["bit_parity"] == "exact"
    assert report["map_floor"] == "pass"
    assert report["metrics"]["AP"] > 25.0
