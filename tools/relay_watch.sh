#!/bin/bash
# Relay watchdog: probe axon backend init in a time-limited subprocess
# every POLL seconds; append one status line per probe to the log.
# Usage: bash tools/relay_watch.sh [logfile] [poll_seconds]
LOG=${1:-/tmp/relay_probe.log}
POLL=${2:-600}
cd "$(dirname "$0")/.." || exit 1
while true; do
  ts=$(date -u +%H:%M:%S)
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$ts UP" >> "$LOG"
  else
    echo "$ts DOWN" >> "$LOG"
  fi
  sleep "$POLL"
done
