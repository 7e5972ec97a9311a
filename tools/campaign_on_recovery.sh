#!/bin/bash
# Wait for the TPU relay to come back, then fire the r4 measurement
# campaign exactly once.  Survives multi-hour outages (r3 lost its
# whole measurement window this way); poll is time-limited so a dead
# relay can never hang the loop.
# Usage: nohup bash tools/campaign_on_recovery.sh & (from the repo root)
set -u
cd "$(dirname "$0")/.." || exit 1
LOCK=/tmp/r4_campaign.fired
[ -e "$LOCK" ] && { echo "campaign already fired ($LOCK)"; exit 0; }
while true; do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "relay UP at $(date -u) — firing campaign" >> /tmp/r4_recovery.log
    touch "$LOCK"
    bash tools/r4_campaign.sh >> /tmp/r4_recovery.log 2>&1
    echo "campaign finished at $(date -u)" >> /tmp/r4_recovery.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) still down" >> /tmp/r4_recovery.log
  sleep 300
done
