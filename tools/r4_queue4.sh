#!/bin/bash
# Round-4 queue #4 (after the PointwiseConv head landed, 512² 29.73):
# re-measure the shapes where the old conv_general_dilated head was
# most expensive (1024²: 4x the relayout bytes), refresh the serving
# number and the op-level breakdowns with the shipped kernel set, and
# run the VERDICT-r3 task-7 parity-vs-deploy campaign at 512²/15 epochs.
# The working tree defaults are the measured winners (attn+head+patch
# on, MLP/block off), so plain bench invocations are the shipped mode.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=/tmp/r4
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

# 1024² with the PointwiseConv head (old head: ~2 GB relayout copies)
run 80_1024_pw 3000 python bench.py --img 1024 --batch 2

# serving-path refresh (r3: 86.8 img/s at batch 16 fwd-only)
run 81_infer_pw 1800 python bench.py --img 512 --batch 16 --mode infer

# op-level breakdowns with the shipped kernel set + PointwiseConv
run 82_512_breakdown_pw 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 512 --batch 8 --top 50 --save /tmp/r4/hlo_512_pw.txt
run 83_1024_breakdown_pw 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 1024 --batch 2 --top 50 --save /tmp/r4/hlo_1024_pw.txt

# VERDICT r3 task 7: deployment-vs-parity numerics at 512²/15 epochs
# with the r4 kernel set (patch on, MLP off)
run 84_parity512 10800 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.parity_vs_deploy \
  --img 512 --epochs 15 --fused_patch --no-fused_mlp

echo "=== queue4 done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
