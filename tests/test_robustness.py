"""Robustness + profiling utility tests."""

import time

import numpy as np
import pytest

from yolort_tpu.utils.robustness import (
    PRETRAINED_REGISTRY,
    Timeout,
    retry,
    sha256_prefix,
    verify_checkpoint,
)


def test_timeout_suppresses():
    start = time.time()
    with Timeout(0.2, "too slow"):
        time.sleep(2.0)
    assert time.time() - start < 1.0


def test_timeout_raises_when_not_suppressed():
    with pytest.raises(TimeoutError):
        with Timeout(0.1, suppress=False):
            time.sleep(1.0)


def test_retry():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("boom")
        return "ok"

    assert retry(flaky, attempts=3, delay=0.01) == "ok"
    assert calls["n"] == 3
    with pytest.raises(ValueError):
        retry(lambda: (_ for _ in ()).throw(ValueError("x")), attempts=2, delay=0.01)


def test_checkpoint_hash_verification(tmp_path):
    p = tmp_path / "weights.bin"
    p.write_bytes(b"hello world")
    prefix = sha256_prefix(str(p))
    assert verify_checkpoint(str(p), prefix)
    assert not verify_checkpoint(str(p), "deadbeef")
    # filename-embedded prefix, reference release style
    named = tmp_path / f"model_coco-{prefix}.bin"
    named.write_bytes(b"hello world")
    assert verify_checkpoint(str(named))
    bad = tmp_path / "model_coco-deadbeef.bin"
    bad.write_bytes(b"hello world")
    assert not verify_checkpoint(str(bad))


def test_registry_covers_reference_zoo():
    # every pretrained arch in the reference registry has an entry
    assert len(PRETRAINED_REGISTRY) == 14
    assert PRETRAINED_REGISTRY["yolov5_darknet_pan_s_r60"].endswith("9f44bf3f")


def test_model_info_smoke():
    import jax

    from yolort_tpu.models.yolo import build_yolo
    from yolort_tpu.utils.profiling import model_info

    m = build_yolo("yolov5_darknet_pan_n_r60", num_classes=4)
    p = m.init(jax.random.PRNGKey(0))
    info = model_info(m, p)
    assert "params:" in info
