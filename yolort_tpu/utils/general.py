"""General small utilities.

Capability parity with the grab-bag helpers in yolort/v5/utils/general.py
(check_img_size:244, make_divisible:318, one_cycle:328, colorstr:333,
init_seeds:109, increment_path:726) — written fresh."""

from __future__ import annotations

import math
import os
import random
from pathlib import Path
from typing import Sequence, Union


def make_divisible(x: float, divisor: int) -> int:
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(imgsz: Union[int, Sequence[int]], s: int = 32, floor: int = 0):
    """Round image size(s) up to a multiple of the model stride."""
    if isinstance(imgsz, int):
        new = max(make_divisible(imgsz, s), floor)
        return new
    return [max(make_divisible(v, s), floor) for v in imgsz]


def init_seeds(seed: int = 0) -> None:
    random.seed(seed)
    import numpy as np

    np.random.seed(seed)


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal ramp y1->y2 (re-exported from trainer.utils)."""
    from yolort_tpu.trainer.utils import one_cycle as _oc

    return _oc(y1, y2, steps)


_COLORS = {
    "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
    "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
    "cyan": "\033[36m", "white": "\033[37m", "bright_red": "\033[91m",
    "bright_green": "\033[92m", "bright_yellow": "\033[93m",
    "bright_blue": "\033[94m", "bold": "\033[1m", "underline": "\033[4m",
    "end": "\033[0m",
}


def colorstr(*inputs):
    """colorstr('blue', 'bold', 'hello') -> ansi-colored string."""
    *styles, string = inputs if len(inputs) > 1 else ("blue", "bold", inputs[0])
    return "".join(_COLORS.get(s, "") for s in styles) + str(string) + _COLORS["end"]


def increment_path(path: str, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... (general.py:726)."""
    p = Path(path)
    if p.exists() and not exist_ok:
        suffix = p.suffix
        stem = p.with_suffix("")
        for n in range(2, 10000):
            cand = Path(f"{stem}{sep}{n}{suffix}")
            if not cand.exists():
                p = cand
                break
    if mkdir:
        (p if not p.suffix else p.parent).mkdir(parents=True, exist_ok=True)
    return p
