#!/bin/bash
# Round-5 second campaign: the kernel decision is settled (dwm backward,
# bwd-pack off) — now the remaining VERDICT tasks in priority order:
# 1024^2 remat/b4 (task 3), 15-epoch parity (task 4), batch-16 remat
# sweep (task 2), f32-kernel step (ADVICE medium).
# Results land in /tmp/r5/<stage>.log.  Usage: bash tools/r5b_campaign.sh [start]
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

# 1024^2 (task 3): re-measure the r4 best with the iota masks, then the
# previously SIGKILLed high_res+patch config (module now 5.7 MiB), then
# the batch-4 attempt it should unlock
run 20 20_1024_b2 3000 python bench.py --img 1024 --batch 2 --steps 20
run 21 21_1024_b2_highres 3000 python bench.py --img 1024 --batch 2 --steps 20 --remat_mode high_res
run 22 22_1024_b4_highres 3000 python bench.py --img 1024 --batch 4 --steps 20 --remat_mode high_res

# deployment-vs-parity campaign (task 4): bf16 deploy arm, shipped set
run 50 50_parity 9000 python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.parity_vs_deploy --img 512 --epochs 15

# batch-16 under explicit remat policies (task 2)
run 12 12_b16_none 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode none
run 13 13_b16_highres 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode high_res
run 14 14_b16_dots 2400 python bench.py --img 512 --batch 16 --steps 30 --remat_mode dots

# f32 train step with the kernel set on hardware (ADVICE medium)
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

echo "r5b campaign done $(date -u +%H:%M:%S)" | tee -a "$OUT/summary.log"
