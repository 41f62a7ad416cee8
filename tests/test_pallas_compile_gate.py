"""Rot test for tools/pallas_compile_gate.py (the Mosaic compile gate,
VERDICT r3 weak #7).  On a CPU runner the tool degrades to the jax.export
lowering-only sweep — this asserts the CLI stays invocable, covers every
kernel family, and exits 0.  The real backend-acceptance evidence comes from
running it on a TPU host (done at round start; result recorded in
docs/PERF.md)."""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_compile_gate_cpu_lowering_sweep():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pallas_compile_gate.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    m = re.search(r"(\d+)/(\d+) passed", proc.stdout)
    assert m, proc.stdout[-2000:]
    assert m.group(1) == m.group(2), proc.stdout[-2000:]
    # every kernel family appears in the sweep
    for fam in ("nms_mask", "row_fetch", "bisect_count", "select_extract",
                "compact_select", "qconv"):
        assert fam in proc.stdout, fam
