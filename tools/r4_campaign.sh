#!/bin/bash
# Round-4 hardware measurement campaign (VERDICT r3 tasks 2, 4, 5).
# One chained script so a relay window is never wasted waiting on an
# operator: compile triage first (cheap, catches Mosaic rejections),
# then op-level A/Bs, then in-step 512² combos, then 1024².
# Results land in /tmp/r4/<stage>.log; the script keeps going on
# failures (each stage is independent evidence).
#
# Usage: bash tools/r4_campaign.sh  (from the repo root, relay UP)
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

# 0. relay sanity + dispatch floor
run 00_floor 900 python -c "
import sys; sys.path.insert(0, '.')
import time, jax, jax.numpy as jnp
x = jnp.ones((8, 128)); f = jax.jit(lambda t: t * 1.000001)
for _ in range(3): f(x)
float(jnp.sum(f(x)))
t0 = time.time()
for _ in range(30): x = f(x)
float(jnp.sum(x))
print('dispatch floor ms:', (time.time() - t0) / 30 * 1e3)
print(jax.devices())
"

# 1. compile triage: the two unmeasured kernels at op level (small shapes)
run 01_triage_patch 1800 python tools/patch_microbench.py --img 256 --batch 2 --iters 5
run 02_triage_block 1800 python tools/stage_microbench.py --dim 128 --heads 4 --depth 2 --grid 16 --batch 2 --iters 5

# 2. op-level A/Bs at the flagship 512² shapes
run 03_patch_ab 2400 python tools/patch_microbench.py --img 512 --batch 8
run 04_stage2_ab 3600 python tools/stage_microbench.py --dim 512 --heads 16 --depth 18 --grid 32 --batch 8

# 3. in-step 512² combos (batch 8, r3 best was 28.29 with attn+head+mlp)
run 10_step_r3best   2400 python bench.py --img 512 --batch 8
run 11_step_block    2400 python bench.py --img 512 --batch 8 --fused_block
run 12_step_patch    2400 python bench.py --img 512 --batch 8 --fused_patch
run 13_step_blockpatch 2400 python bench.py --img 512 --batch 8 --fused_block --fused_patch
run 14_step_block_nomlp 2400 python bench.py --img 512 --batch 8 --fused_block --no_fused_mlp
# batch 16 fits on the kernel path (r2: 26.2); the block/patch kernels
# shrink activations further — HBM-bound steps often prefer the bigger batch
run 15_step_blockpatch_b16 2400 python bench.py --img 512 --batch 16 --fused_block --fused_patch

# 4. 1024² batch 2 (the reference's literal workload; r2 best 5.35)
run 20_1024_base  3000 python bench.py --img 1024 --batch 2
run 21_1024_block 3000 python bench.py --img 1024 --batch 2 --fused_block
run 22_1024_patch 3000 python bench.py --img 1024 --batch 2 --fused_patch
run 23_1024_blockpatch 3000 python bench.py --img 1024 --batch 2 --fused_block --fused_patch
run 24_1024_blockpatch_hr 3000 python bench.py --img 1024 --batch 2 --fused_block --fused_patch --remat_mode high_res
# batch 4 OOM'd every r2 config; the block+patch kernels may change that
run 25_1024_b4_blockpatch 3000 python bench.py --img 1024 --batch 4 --fused_block --fused_patch

# 4b. op-level evidence for the 1024^2 floor-or-improvement decision
#     (VERDICT r3 task 4: the dead-end entry must be argued from r4 data)
run 26_1024_breakdown 3600 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown \
  --img 1024 --batch 2 --fused_block --fused_patch --top 50 \
  --save /tmp/r4/hlo_1024.txt

# 5. deployment-vs-parity numerics at the deployment resolution
#    (VERDICT r3 task 7; pass the winning kernel set by editing FLAGS
#    after reading 10-14; default = shipped config)
PARITY_FLAGS="${PARITY_FLAGS:-}"
if [ "${SKIP_PARITY:-0}" = "1" ]; then
  echo "=== parity stage skipped (SKIP_PARITY=1) ===" | tee -a "$OUT/summary.log"
  echo "=== campaign done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
  exit 0
fi
run 30_parity_deploy 10800 python -m \
  semantic_segmentation_of_stylegan2_artifacts_tpu.tools.parity_vs_deploy \
  --img 512 --epochs 15 $PARITY_FLAGS

echo "=== campaign done $(date -u +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
