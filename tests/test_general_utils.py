"""Tests for general utils + callbacks registry."""

import pytest

from yolort_tpu.utils.callbacks import Callbacks
from yolort_tpu.utils.general import (
    check_img_size,
    colorstr,
    increment_path,
    init_seeds,
    make_divisible,
)


def test_make_divisible_and_img_size():
    assert make_divisible(97, 32) == 128
    assert check_img_size(640, 32) == 640
    assert check_img_size(641, 32) == 672
    assert check_img_size([640, 641], 32) == [640, 672]


def test_colorstr():
    s = colorstr("hello")
    assert "hello" in s and s.endswith("\033[0m")


def test_increment_path(tmp_path):
    p = tmp_path / "exp"
    p.mkdir()
    p2 = increment_path(str(p))
    assert p2.name == "exp2"
    assert increment_path(str(p), exist_ok=True) == p


def test_init_seeds_deterministic():
    import numpy as np

    init_seeds(3)
    a = np.random.rand(4)
    init_seeds(3)
    b = np.random.rand(4)
    assert (a == b).all()


def test_callbacks_registry():
    cb = Callbacks()
    seen = []
    cb.register_action("on_train_start", "logger", lambda **kw: seen.append(kw))
    cb.run("on_train_start", epoch=0)
    assert seen == [{"epoch": 0}]
    with pytest.raises(ValueError):
        cb.register_action("bogus_hook", callback=lambda: None)
    with pytest.raises(ValueError):
        cb.register_action("on_train_start", callback="not callable")
    assert len(cb.get_registered_actions("on_train_start")) == 1
