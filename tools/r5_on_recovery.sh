#!/bin/bash
# Wait for the TPU relay's EXECUTION path to come back (compiles can
# succeed while execute/fetch hangs — observed 2026-08-20), then fire
# the r5 measurement campaign exactly once.  Probe = compile + run +
# value fetch, time-limited so a dead relay can never hang the loop.
# Usage: nohup bash tools/r5_on_recovery.sh & (from the repo root)
set -u
cd "$(dirname "$0")/.." || exit 1
LOCK=/tmp/r5_campaign.fired
[ -e "$LOCK" ] && { echo "campaign already fired ($LOCK)"; exit 0; }
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)); f = jax.jit(lambda t: t * 1.000001)
assert abs(float(jnp.sum(f(x))) - 1024.001) < 0.1
" >/dev/null 2>&1; then
    echo "relay exec UP at $(date -u) — firing r5 campaign" >> /tmp/r5_recovery.log
    touch "$LOCK"
    bash tools/r5_campaign.sh >> /tmp/r5_recovery.log 2>&1
    echo "campaign finished at $(date -u)" >> /tmp/r5_recovery.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) exec still down" >> /tmp/r5_recovery.log
  sleep 180
done
