#!/bin/bash
# Round-4 queue #2: per-stage measured cost at 512² shapes (where does
# the 276 ms step actually sit?), patch-op A/B, then 1024² with the
# repaired whole-block + fused-patch kernels. Waits for any PID given in
# $1 (the in-flight bench) before touching the chip.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=/tmp/r4c
mkdir -p "$OUT"

if [ "${1:-}" != "" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -6 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
}

run 10_stage0 1800 python tools/stage_microbench.py \
  --dim 128 --heads 4 --depth 2 --grid 128 --batch 8 --sublayers
run 11_stage1 1800 python tools/stage_microbench.py \
  --dim 256 --heads 8 --depth 2 --grid 64 --batch 8
run 12_stage2 1800 python tools/stage_microbench.py \
  --dim 512 --heads 16 --depth 18 --grid 32 --batch 8
run 13_stage3 1800 python tools/stage_microbench.py \
  --dim 1024 --heads 32 --depth 2 --grid 16 --batch 8
run 20_patch 1800 python tools/patch_microbench.py
run 30_1024_blockpatch 3000 python bench.py --img 1024 --batch 2 \
  --fused_block --fused_patch
run 31_1024_bp_hr 3000 python bench.py --img 1024 --batch 2 \
  --fused_block --fused_patch --remat_mode high_res
echo "=== queue2 done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
