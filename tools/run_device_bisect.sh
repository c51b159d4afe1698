#!/bin/bash
# Serialize device experiments with health gates: before each variant,
# poll tools/device_health.py until the TPU worker answers (crash/hang
# recovery backoff otherwise poisons the NEXT experiment's verdict).
# Usage: run_device_bisect.sh <tool.py> <variant...>
set -u
TOOL="$1"; shift
for v in "$@"; do
  for i in $(seq 1 12); do
    if timeout 180 python tools/device_health.py 120 >/dev/null 2>&1; then
      break
    fi
    echo "[health] worker not ready (try $i), waiting 30s" >&2
    sleep 30
  done
  echo "=== $v"
  timeout 900 python "$TOOL" "$v" 2>&1 | tail -2
done
