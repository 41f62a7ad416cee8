"""C++ PJRT driver gate (reference ci-test.yml:120-147 builds and runs its
C++ e2e every CI run).  Needs real TPU access -> gated like the other
hardware tests: YOLORT_TPU_TESTS=1 pytest tests/test_cpp_driver.py"""

import os
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("YOLORT_TPU_TESTS") != "1",
    reason="hardware smoke test; set YOLORT_TPU_TESTS=1",
)


def test_pjrt_driver_smoke_and_parity():
    """export fixture ckpt -> build -> compile -> execute -> readback ->
    boxes/scores/labels parity vs the Python run of the same program
    (reference contract: test_runtime_ort.py:44-59 at 1e-3/1e-5)."""
    proc = subprocess.run(
        ["bash", str(REPO / "deployment" / "pjrt" / "smoke.sh")],
        capture_output=True, text=True, timeout=580,
        env={k: v for k, v in os.environ.items() if k != "YOLORT_TPU_TESTS"},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "detections per image:" in proc.stdout
    assert "PARITY OK" in proc.stdout
    assert "SMOKE OK" in proc.stdout
