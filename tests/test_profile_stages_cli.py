"""tools/profile_stages.py smoke: the cells-path profiler (the observability
tool for the auto eval postprocess) must run the full stage chain on CPU at
tiny shapes and print one row per stage."""

import subprocess
import sys
from pathlib import Path

import pytest

import yolort_tpu

_REPO = str(Path(yolort_tpu.__file__).resolve().parent.parent)


@pytest.mark.slow
def test_profile_stages_cells_cpu():
    out = subprocess.run(
        [sys.executable, "-u", "tools/profile_stages.py", "--device", "cpu",
         "--batch", "1", "--size", "96", "--topk", "32",
         "--stages", "cells", "--dtype", "float32"],
        capture_output=True, text=True, timeout=540, cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for row in ("cells concat + stage-1", "+ stage-1 sort-select",
                "+ cell-row gather", "+ seg extract + box decode",
                "+ stage-2 pair select", "+ box gather + NMS + compact"):
        assert row in out.stdout, out.stdout
