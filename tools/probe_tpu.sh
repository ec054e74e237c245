#!/bin/bash
# Poll the axon TPU tunnel with a bounded subprocess probe (jax.devices()
# HANGS in-process when the tunnel is down — CLAUDE.md). The moment the
# tunnel answers, fire the on-chip adoption batch once and exit.
#
# Usage: nohup bash tools/probe_tpu.sh >/tmp/probe_tpu.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
INTERVAL="${PROBE_INTERVAL_S:-600}"
PROBE_TIMEOUT="${PROBE_TIMEOUT_S:-180}"
while true; do
  echo "[probe] $(date -u +%FT%TZ) probing (timeout ${PROBE_TIMEOUT}s)..."
  if timeout "$PROBE_TIMEOUT" python -c \
      'import jax; d = jax.devices(); print("up:", d[0].platform, len(d), flush=True)'; then
    echo "[probe] tunnel is UP — launching on-chip batch"
    bash tools/onchip_batch.sh
    exit 0
  fi
  echo "[probe] down; sleeping ${INTERVAL}s"
  sleep "$INTERVAL"
done
