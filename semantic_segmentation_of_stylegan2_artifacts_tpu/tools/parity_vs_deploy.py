"""Deployment-vs-parity numerics A/B on the real chip.

Trains the synthetic-data e2e config twice with identical seeds/data:
  parity  — erf GELU, f32 compute + f32 softmax, no Pallas kernels
  deploy  — the SHIPPED deployment defaults (core/config.py TPU block):
            bf16 compute, tanh GELU, bf16 softmax, fused
            attention+refine-head+patch kernels
and prints the final-epoch validation metric rows plus their deltas
(the measured table lives in PARITY.md).  Matches the reference's
fp16-AMP training-parity intent (/root/reference/trainer.py:182,308).

``--deploy_f32`` keeps the deploy arm in f32 compute (isolates the
kernel/GELU/softmax effects from the bf16 cast), and ``--img/--epochs``
scale the run to the deployment resolution (VERDICT r4 task 4: 512²,
>=15 epochs, shipped kernel set).

Usage::

    python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.parity_vs_deploy \
        --img 512 --epochs 15 [--no-fused_patch] [--deploy_f32]
"""
import argparse
import csv
import logging
import os
import shutil
import sys
import tempfile

from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.platform import (
    apply_platform_override,
    enable_compilation_cache,
)

apply_platform_override()  # honor SSA_TPU_PLATFORM=cpu (CPU smoke runs)
enable_compilation_cache()

from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
    default_config,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.trainer import (
    trainer,
)

def run_one(tag: str, root: str, out_base: str, deploy: bool,
            args) -> dict:
    IMG, EPOCHS = args.img, args.epochs
    c = default_config()
    c.defrost()
    c.DATA.DATA_PATH = root
    c.DATA.IMG_SIZE = IMG
    c.DATA.BATCH_SIZE = 4
    c.LIST_DIR = os.path.join(root, "lists")
    c.TRAIN.MAX_EPOCHS = EPOCHS
    c.TRAIN.WARMUP_EPOCHS = 2
    c.TRAIN.BASE_LR = 3e-4
    c.MODEL.FREEZE_ENCODER = False
    c.SAVE_BEST_RUN = False
    c.SHOW_PREDICTIONS = 0
    c.DATA.NUM_WORKERS = 2
    c.SEED = 1234
    c.TPU.GELU_TANH = deploy
    c.TPU.SOFTMAX_DTYPE = "bfloat16" if deploy else "float32"
    c.TPU.USE_PALLAS_ATTENTION = deploy
    c.TPU.FUSED_HEAD = deploy
    c.TPU.FUSED_PATCH = deploy and args.fused_patch
    c.freeze()

    import jax.numpy as jnp
    deploy_dtype = (jnp.float32 if (not deploy or args.deploy_f32)
                    else jnp.bfloat16)
    model = MSUNet(img_size=IMG, embed_dim=128, depths=(2, 2, 2, 2),
                   num_heads=(4, 8, 16, 32), window_size=7,
                   gelu_tanh=deploy,
                   use_pallas=deploy, fused_head=deploy,
                   use_fused_patch=deploy and args.fused_patch,
                   dtype=deploy_dtype,
                   softmax_dtype=jnp.bfloat16 if deploy else jnp.float32)
    out_dir = os.path.join(out_base, tag)
    logger = logging.getLogger(tag)
    res = trainer(model, logger, None, out_dir, c)
    print(tag, "->", res, flush=True)
    rows = {}
    with open(os.path.join(out_dir, "val_metric_all_epoch.csv")) as f:
        r = list(csv.reader(f))
    header = r[0]
    final = r[-1]
    rows = dict(zip(header, final))
    print(tag, "final:", rows, flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--epochs", type=int, default=8)
    # default = the shipped kernel set (core/config.py TPU block):
    # attention + refine-head + patch kernels on
    ap.add_argument("--fused_patch", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--deploy_f32", action="store_true",
                    help="keep the deploy arm in f32 compute (isolates "
                         "kernel/GELU/softmax effects from the bf16 cast)")
    args = ap.parse_args()
    out_base = tempfile.mkdtemp(prefix="parity_deploy_")
    root = os.path.join(out_base, "data")
    generate_synthetic_dataset(root, img_size=args.img, n_fake_train=12,
                               n_real_train=8, n_val_fake=4, n_val_real=2)
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    a = run_one("parity", root, out_base, deploy=False, args=args)
    b = run_one("deploy", root, out_base, deploy=True, args=args)
    print("\n== deltas (deploy - parity) ==")
    for k in a:
        try:
            d = float(b[k]) - float(a[k])
            print(f"  {k:>12s}: parity {float(a[k]):.5f}  deploy "
                  f"{float(b[k]):.5f}  delta {d:+.5f}")
        except ValueError:
            pass
    shutil.rmtree(os.path.join(out_base, "data"), ignore_errors=True)
    print("outputs kept in", out_base)


if __name__ == "__main__":
    main()
