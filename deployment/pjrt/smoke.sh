#!/usr/bin/env bash
# C++ PJRT driver smoke gate: export a weights-baked module -> build the
# driver -> compile+execute against a PJRT plugin -> assert detection
# readback.  The reference runs its C++ e2e in CI on every push
# (ci-test.yml:120-147); this is the TPU-native equivalent.
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

OUT="${TMPDIR:-/tmp}/yolort_pjrt_smoke"
mkdir -p "$OUT"
MODULE="$OUT/yolov5n_320.mlirbc"

# 1. export (nano @320 compiles in ~10s through the relay; score_thresh 1e-6
#    guarantees a full 300-detection readback from random weights)
python - "$MODULE" <<'PY'
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from yolort_tpu.models.yolo import build_yolo
from yolort_tpu.runtime.aot import export_stablehlo_binary

model = build_yolo("yolov5_darknet_pan_n_r60", score_thresh=1e-6,
                   pre_nms_topk=256, nms_tile_size=64, nms_impl="xla")
params = model.init(jax.random.PRNGKey(0))
export_stablehlo_binary(model, params, sys.argv[1], batch_size=1,
                        input_hw=(320, 320), dtype=jnp.bfloat16)
print(f"exported: {sys.argv[1]}")
PY

# 2. build the driver if missing
DRIVER=deployment/pjrt/build/pjrt_yolo_driver
if [ ! -x "$DRIVER" ]; then
  (cd deployment/pjrt && mkdir -p build && cd build && cmake .. -G Ninja >/dev/null && ninja)
fi

# 3. run: compile + execute + detection readback (axon tunnel env is a no-op
#    for other plugins)
LOG="$OUT/driver.log"
env AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 AXON_COMPAT_VERSION=49 \
  "$DRIVER" "$PLUGIN" "$MODULE" 1 320 320 3 | tee "$LOG"

# 4. gate: the driver must have read detections back from the device
grep -q "detections per image:" "$LOG" || { echo "SMOKE FAIL: no detection readback"; exit 1; }
echo "SMOKE OK"
