"""bench.py smoke test: the driver's round-end measurement tool must never
crash wholesale (BENCH_r03 shipped ``rc: 1, parsed: null`` because one
unguarded row — the bf16 train row — threw and the JSON printed only at the
very end).  This runs the REAL bench as a subprocess on CPU with a tiny
config, ALL rows enabled, in the bench's default bfloat16, and asserts:
rc == 0, the output parses as one JSON line, no row recorded an error, and
every expected row is populated.

Mirrors the reference's compile-and-run CI gate idea
(/root/reference/.github/workflows/ci-test.yml:120-147) applied to the
measurement tool itself.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW_KEYS = [
    "value",
    "p50_ms_b1",
    "p99_ms_b1",
    "p50_ms_b1_device",
    "p50_ms_b8",
    "p99_ms_b8",
    "p50_ms_b8_device",
    "streaming_imgs_per_sec",
    "streaming_device_imgs_per_sec",
    "train_imgs_per_sec",
    "eval_imgs_per_sec",
    "eval_xla_imgs_per_sec",
    "int8_imgs_per_sec",
    "eval_int8_imgs_per_sec",
    "p6_bf16_imgs_per_sec",
    "p6_int8_imgs_per_sec",
    "arch2_imgs_per_sec",
]


def test_bench_all_rows_tiny_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("YOLORT_PALLAS_FETCH", None)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--arch", "yolov5_darknet_pan_n_r60",
            "--batch", "2", "--size", "64",
            "--iters", "2", "--repeat", "1",
            "--pre-nms-topk", "64", "--eval-topk", "128",
            "--candidates", "8",
            "--latency-calls", "3",
            "--stream-batch", "2", "--stream-nbatches", "2",
            "--train-batch", "2", "--train-steps", "2",
            # 3 steps exercise the int8 AP-delta row end-to-end; the probe
            # only converges (delta becomes meaningful) at the default 1000
            "--int8-ap-steps", "3",
            # P6 rows at a tiny config (stride-64 level needs size % 64 == 0)
            "--p6-size", "64", "--p6-batch", "2", "--p6-iters", "2",
        ],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    result = json.loads(lines[-1])
    errors = {k: v for k, v in result.items() if k.endswith("_error") or k == "error"}
    assert not errors, (errors, result)
    for key in ROW_KEYS:
        assert key in result, (key, sorted(result))
        assert float(result[key]) > 0, (key, result[key])
    # the calibration row ran (candidate load is realistic, not degenerate)
    assert "candidates_per_img@0.25" in result
    assert result["latency_calls"] == 3
    # the int8 accuracy row ran (values only converge at full steps)
    assert "int8_ap_delta" in result, sorted(result)
    assert "int8_ap_float" in result, sorted(result)


def test_bench_row_failure_is_contained():
    """A crashing row must cost only that row: inject a train-row fault via
    the YOLORT_BENCH_FAULT test hook and assert the bench still exits 0 with
    the other rows populated and a train_error recorded — the property whose
    absence zeroed BENCH_r03."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("YOLORT_PALLAS_FETCH", None)
    env["YOLORT_BENCH_FAULT"] = "train"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--arch", "yolov5_darknet_pan_n_r60",
            "--batch", "2", "--size", "64",
            "--iters", "2", "--repeat", "1",
            "--pre-nms-topk", "64", "--eval-topk", "128",
            "--candidates", "8",
            "--skip-latency", "--skip-streaming", "--skip-eval-config",
            "--skip-int8",
            "--train-batch", "2", "--train-steps", "2",
            # tiny P6 config, same as the all-rows test: without it the
            # default P6@1280 rows run on CPU and blow the 900 s timeout
            "--p6-size", "64", "--p6-batch", "2", "--p6-iters", "2",
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    result = json.loads(lines[-1])
    assert "train_error" in result, result
    assert float(result["value"]) > 0, result
