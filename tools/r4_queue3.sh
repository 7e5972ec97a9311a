#!/bin/bash
# Round-4 queue #3 (curated from the 18:0x-19:1x campaign results):
# the whole-block kernel SIGKILLs the compile helper at full-model 512²
# and VMEM-OOMs at op level (dim-512 backward result tuple > 16M scoped
# limit), so its in-step stages are dropped until the kernel is repaired.
# What remains: a clean fused-MLP in-step A/B, patch-kernel combos, the
# hot-shape per-op A/Bs (block leg now fails soft), 1024² combos, and
# fresh 512²/1024² op-level breakdowns.  Waits on $1 (in-flight bench
# PID) before touching the chip.
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

# fused-MLP in-step A/B at 512² (stage 10 = with MLP kernel, 28.27;
# stage 11's degraded fallback = no-mlp, 28.86 — floor differed, settle it)
run 40_step_nomlp 2400 python bench.py --img 512 --batch 8 --no_fused_mlp
run 41_step_patch_nomlp 2400 python bench.py --img 512 --batch 8 \
  --fused_patch --no_fused_mlp

# hot-shape per-op A/Bs (block leg fails soft now)
run 42_stage2_ab 3600 python tools/stage_microbench.py \
  --dim 512 --heads 16 --depth 18 --grid 32 --batch 8 --sublayers
run 43_stage0_ab 1800 python tools/stage_microbench.py \
  --dim 128 --heads 4 --depth 2 --grid 128 --batch 8 --sublayers

# 1024² (reference's literal workload; r2 best 5.35)
run 50_1024_base 3000 python bench.py --img 1024 --batch 2
run 51_1024_patch 3000 python bench.py --img 1024 --batch 2 --fused_patch
run 52_1024_patch_hr 3000 python bench.py --img 1024 --batch 2 \
  --fused_patch --remat_mode high_res

# op-level breakdowns with the current kernel set
run 60_512_breakdown 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 512 --batch 8 --top 50 --save /tmp/r4/hlo_512.txt
run 61_1024_breakdown 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 1024 --batch 2 --top 50 --save /tmp/r4/hlo_1024.txt

echo "=== queue3 done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
