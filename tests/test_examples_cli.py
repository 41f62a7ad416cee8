"""Worked-example scripts (examples/) must keep running end-to-end — they
are the reference-notebook analogs and rot silently otherwise.  Slow tier."""

import subprocess
import sys
from pathlib import Path

import pytest

import yolort_tpu

_REPO = str(Path(yolort_tpu.__file__).resolve().parent.parent)


def _run(script, *extra):
    out = subprocess.run(
        [sys.executable, "-u", f"examples/{script}", *extra],
        capture_output=True, text=True, timeout=540, cwd=_REPO,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    return out.stdout


@pytest.mark.slow
def test_model_graph_visualization(tmp_path):
    out = _run("model_graph_visualization.py", "--out", str(tmp_path))
    for token in ("jaxpr", "stablehlo", "optimized HLO", "cost analysis", "dot graph"):
        assert token in out, out
    assert (tmp_path / "model.dot").exists()


@pytest.mark.slow
def test_label_assignment_visualization(tmp_path):
    out = _run("label_assignment_visualization.py", "--out", str(tmp_path))
    assert "level P3" in out and "level P5" in out
    assert (tmp_path / "assignment_P4.png").exists()
    assert "evaluated OK" in out


@pytest.mark.slow
def test_align_with_ultralytics():
    out = _run("align_with_ultralytics.py", "--size", "192")
    assert "ALIGNED" in out, out
