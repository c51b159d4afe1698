#!/bin/bash
# Serialize device experiments with health gates: before each variant,
# poll tools/device_health.py until the TPU worker answers (crash/hang
# recovery backoff otherwise poisons the NEXT experiment's verdict).
# Usage: run_device_bisect.sh <tool.py> <variant...>
set -u
TOOL="$1"; shift
for v in "$@"; do
  ok=0
  for i in $(seq 1 12); do
    if timeout 180 python tools/device_health.py 120 >/dev/null 2>&1; then
      ok=1; break
    fi
    echo "[health] worker not ready (try $i), waiting 30s"
    sleep 30
  done
  echo "=== $v"
  if [ "$ok" != 1 ]; then
    echo "SKIPPED: worker unhealthy for ~40min — verdict would be garbage"
    continue
  fi
  timeout 900 python "$TOOL" "$v" 2>&1 | tail -2
done
