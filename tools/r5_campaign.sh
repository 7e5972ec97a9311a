#!/bin/bash
# Round-5 hardware measurement campaign (VERDICT r4 tasks 1, 2, 3, 8 +
# ADVICE f32-backward confirmation).  One chained script so a relay
# window is never wasted; each stage is independent evidence and the
# script keeps going on failures.  Results land in /tmp/r5/<stage>.log.
#
# Usage: bash tools/r5_campaign.sh [start_stage]  (repo root, relay UP)
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=/tmp/r5
mkdir -p "$OUT"
START=${1:-0}

run() { # run <stagenum> <name> <timeout_s> <cmd...>
  local num=$1 name=$2 to=$3; shift 3
  [ "$num" -lt "$START" ] && return
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
}

# 0. relay sanity + dispatch floor
run 0 00_floor 900 python -c "
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

# 1. packed attention-backward: headline 512^2 b8 (VERDICT task 1)
run 10 10_step_packedbwd 2400 python bench.py --img 512 --batch 8 --steps 40
# narrower score groups: 8 vs 16 MXU passes per 10-window strip
run 11 11_step_scap256 2400 env SSA_ATTN_S_CAP=256 python bench.py --img 512 --batch 8 --steps 40

# 2. batch-16 under explicit remat policies (VERDICT task 2; the r2/r4
#    probes lost to XLA auto-remat cliffs with no explicit policy)
run 12 12_b16_none 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode none
run 13 13_b16_highres 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode high_res
run 14 14_b16_dots 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode dots
run 15 15_b16_full 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode full

# 3. 1024^2 with the iota-mask fix (VERDICT task 3): re-measure the r4
#    best, then the previously SIGKILLed high_res+patch config, then b4
run 20 20_1024_patch 3000 python bench.py --img 1024 --batch 2 --steps 20
run 21 21_1024_highres 3000 python bench.py --img 1024 --batch 2 --steps 20 --remat_mode high_res
run 22 22_1024_b4_highres 3000 python bench.py --img 1024 --batch 4 --steps 20 --remat_mode high_res
run 23 23_1024_b4_none 3000 python bench.py --img 1024 --batch 4 --steps 20 --remat_mode none

# 4. f32 train step with the kernel set (ADVICE medium: confirm the
#    packed/in-place backward compiles in f32 on hardware — the
#    parity_vs_deploy --deploy_f32 path)
run 30 30_f32_step 2400 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np, time
from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import default_config
from semantic_segmentation_of_stylegan2_artifacts_tpu.train import create_train_state
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import make_train_step
m = MSUNet(img_size=512, embed_dim=128, depths=(2, 2, 18, 2),
           num_heads=(4, 8, 16, 32), window_size=7, dtype=jnp.float32,
           use_pallas=True, fused_head=True, use_fused_patch=True,
           gelu_tanh=True, softmax_dtype=jnp.float32)
c = default_config(); c.defrost(); c.DATA.IMG_SIZE = 512
c.MODEL.FREEZE_ENCODER = False; c.freeze()
t0 = time.time()
s = create_train_state(m, c, jax.random.PRNGKey(0),
                       jnp.zeros((1, 512, 512, 3), jnp.float32))
print(f"init {time.time()-t0:.1f}s", flush=True)
step = make_train_step(m, 0.2, 0.8, 0.45, donate=False)
rng = np.random.RandomState(0)
img = jnp.asarray(rng.randint(0, 255, (4, 512, 512, 3)), jnp.uint8)
lbl = jnp.asarray((rng.rand(4, 512, 512) > 0.8), jnp.uint8)
t0 = time.time()
_, loss = step(s, img, lbl, jnp.asarray(1e-4, jnp.float32))
print(f"f32 step compile+run {time.time()-t0:.1f}s loss={float(loss):.5f}", flush=True)
print("F32_STEP_OK")
EOF

# 5. stage-2 sublayer A/B with the packed backward (evidence for task 1)
run 31 31_stage2_sublayers 3600 python tools/stage_microbench.py --dim 512 --heads 16 --depth 18 --grid 32 --batch 8 --sublayers

# 6. optimizer / update-phase share at batch >= 8 (VERDICT task 8):
#    op-level breakdown of the full step; the AdamW fusion shows up in
#    the top-fusions table
run 40 40_hlo_breakdown 3600 python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.hlo_breakdown --img 512 --batch 8 --fused_patch --top 40

# 7. deployment-vs-parity campaign (VERDICT task 4) — longest stage
run 50 50_parity 9000 python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.parity_vs_deploy --img 512 --epochs 15

echo "campaign done $(date -u +%H:%M:%S)" | tee -a "$OUT/summary.log"
