#!/usr/bin/env bash
# C++ PJRT driver gate: export a weights-baked module from the FIXTURE
# checkpoint -> build the driver -> compile+execute on a deterministic input
# -> compare the driver's readback against the same program run from Python
# (boxes/scores/labels parity, the reference's deployed-backend contract:
# test/test_runtime_ort.py:44-59 at rtol 1e-3 / atol 1e-5; its C++ e2e gate
# is ci-test.yml:120-147).  A driver that returned garbage boxes now fails.
#
# Usage: deployment/pjrt/smoke.sh [plugin.so]
#   YOLORT_PJRT_PLUGIN   overrides the plugin (default: the axon tunnel
#                        plugin in this image, else libtpu from the venv)
set -euo pipefail
cd "$(dirname "$0")/../.."

PLUGIN="${1:-${YOLORT_PJRT_PLUGIN:-}}"
if [ -z "$PLUGIN" ]; then
  for cand in /opt/axon/libaxon_pjrt.so /opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so; do
    [ -f "$cand" ] && PLUGIN="$cand" && break
  done
fi
[ -n "$PLUGIN" ] || { echo "FATAL: no PJRT plugin found"; exit 1; }
echo "plugin: $PLUGIN"

# Mirror the Python stack's measured TPU compiler default (PERF.md win 13,
# utils/compile_options.py): on a real libtpu host the flag is read from the
# environment at compile time; through the axon relay it is a no-op (the
# relay compiles server-side) — the Python path passes it per-jit instead.
VMEM_KIB="${YOLORT_XLA_VMEM_KIB:-40960}"
if [ "$VMEM_KIB" != "0" ]; then
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_tpu_scoped_vmem_limit_kib=$VMEM_KIB"
fi

OUT="${TMPDIR:-/tmp}/yolort_pjrt_smoke"
mkdir -p "$OUT"
MODULE="$OUT/yolov5s_fixture_640.mlirbc"
CKPT="$OUT/fixture_s.pt"
INPUT="$OUT/input_u8.bin"

# 1. fabricate the fixture checkpoint and export the weights-baked module
#    (s-widths @640, f32 so the parity compare is at full precision; the
#    deterministic input is written alongside).  Export only traces — CPU.
python - "$CKPT" "$MODULE" "$INPUT" <<'PY'
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from tests.torch_fixture import make_checkpoint
from yolort_tpu.models.yolov5 import YOLOv5
from yolort_tpu.runtime.aot import export_stablehlo_binary

ckpt, module, inp = sys.argv[1:4]
make_checkpoint(ckpt, nc=80, dm=0.33, wm=0.5, seed=7, head_cls_bias_noise=2.0)
m = YOLOv5.load_from_yolov5(ckpt, score_thresh=1e-4, fixed_shape=(640, 640),
                            pre_nms_topk=256, nms_tile_size=64, nms_impl="xla")
export_stablehlo_binary(m.model, m.params, module, batch_size=1,
                        input_hw=(640, 640), dtype=jnp.float32)
rng = np.random.default_rng(42)
rng.integers(0, 255, (1, 640, 640, 3), dtype=np.uint8).tofile(inp)
print(f"exported: {module}")
PY

# 2. build the driver if missing
DRIVER=deployment/pjrt/build/pjrt_yolo_driver
if [ ! -x "$DRIVER" ]; then
  (cd deployment/pjrt && mkdir -p build && cd build && cmake .. -G Ninja >/dev/null && ninja)
fi

# 3. run: compile + execute on the deterministic input + full output dump
LOG="$OUT/driver.log"
env AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 AXON_COMPAT_VERSION=49 \
  "$DRIVER" "$PLUGIN" "$MODULE" 1 640 640 3 "$INPUT" "$OUT/dump" | tee "$LOG"
grep -q "detections per image:" "$LOG" || { echo "SMOKE FAIL: no detection readback"; exit 1; }

# 4. numerical parity: the same pipeline run from Python (same backend via
#    the session's default platform) must match the driver's readback
python - "$CKPT" "$INPUT" "$OUT/dump" <<'PY'
import sys

import numpy as np
import jax
import jax.numpy as jnp

from yolort_tpu.models.yolov5 import YOLOv5

ckpt, inp, prefix = sys.argv[1:4]
m = YOLOv5.load_from_yolov5(ckpt, score_thresh=1e-4, fixed_shape=(640, 640),
                            pre_nms_topk=256, nms_tile_size=64, nms_impl="xla")
raw = np.fromfile(inp, np.uint8).reshape(1, 640, 640, 3)

def fn(params, raw_u8):
    imgs = raw_u8.astype(jnp.float32) * (1.0 / 255.0)
    det = m.model(params, imgs)
    return det.boxes, det.scores, det.labels, det.num

boxes, scores, labels, num = (np.asarray(v) for v in jax.jit(fn)(m.params, jnp.asarray(raw)))

d_boxes = np.fromfile(prefix + ".boxes.f32", np.float32).reshape(1, 300, 4)
d_scores = np.fromfile(prefix + ".scores.f32", np.float32).reshape(1, 300)
d_labels = np.fromfile(prefix + ".labels.i32", np.int32).reshape(1, 300)
d_num = np.fromfile(prefix + ".num.i32", np.int32)

assert int(d_num[0]) == int(num[0]), f"num mismatch: driver {d_num[0]} vs python {num[0]}"
n = int(num[0])
assert n > 0, "no detections to compare (fixture should produce a full readback)"

# near-tied fixture scores can legally reorder between compiles: compare in a
# canonical (-score, x1, y1) order
def canon(b, s, l):
    order = np.lexsort((b[:, 1], b[:, 0], -s))
    return b[order], s[order], l[order]

pb, ps, pl = canon(boxes[0, :n], scores[0, :n], labels[0, :n])
db, ds, dl = canon(d_boxes[0, :n], d_scores[0, :n], d_labels[0, :n])
np.testing.assert_allclose(ds, ps, rtol=1e-3, atol=1e-5, err_msg="scores")
np.testing.assert_allclose(db, pb, rtol=1e-3, atol=1e-2, err_msg="boxes")
assert (dl == pl).mean() > 0.99, f"labels mismatch rate {(dl != pl).mean():.3f}"
print(f"PARITY OK: {n} detections, scores/boxes within 1e-3, labels equal")
PY

echo "SMOKE OK"
