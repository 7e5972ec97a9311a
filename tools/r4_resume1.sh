#!/bin/bash
# Round-4 campaign resume #1: the stages that do NOT depend on the
# fused-block/fused-patch kernels (both failed hardware compile in the
# 05:0x triage — see /tmp/r4/0{1,2,3,4}*.log). Step timings with the
# r3-best kernel set (attn + refine head + fused MLP: the MLP kernel's
# first hardware exposure; bench.py degrades tiers on compile failure),
# then the 1024^2 baseline and its op-level breakdown.
# Detach with setsid so API-session crashes don't kill the run.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=/tmp/r4
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
}

run 10_step_r3best   2400 python bench.py --img 512 --batch 8
run 15_step_b16      2400 python bench.py --img 512 --batch 16
run 20_1024_base     3000 python bench.py --img 1024 --batch 2
run 24_1024_hr       3000 python bench.py --img 1024 --batch 2 --remat_mode high_res
run 26_1024_breakdown 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 1024 --batch 2 --top 50 --save /tmp/r4/hlo_1024.txt
echo "=== resume1 done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
