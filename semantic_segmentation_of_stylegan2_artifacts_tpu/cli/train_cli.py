"""``python train.py --cfg config.yaml`` — one training run.

Mirrors the reference entry point (reference ``train.py:24-122``):
frozen-config load, hyperparameter echo, output dir with a
``config_used.yaml`` copy, ``log.txt`` file logging + TensorBoard writer,
model build with optional pretrained-weight ingestion (SegFace /
ImageNet1k PyTorch checkpoints via the key-mapped converter), then the
trainer dispatch table.
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import shutil
from datetime import datetime

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE",
                        help="path to config file")
    parser.add_argument("--resume", type=str, default=None, metavar="CKPT",
                        help="resume from an epoch_N.msgpack checkpoint "
                             "(params + optimizer + epoch)")
    return parser


def setup_run_dir_and_logging(config, cfg_path: str):
    output_dir = config.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    shutil.copy(cfg_path, os.path.join(output_dir, "config_used.yaml"))

    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    logging.basicConfig(
        filename=os.path.join(output_dir, "log.txt"),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
    )
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(output_dir + "/log")
    except Exception:
        writer = None
    return output_dir, writer


def echo_hyperparameters(config) -> None:
    for line in (
        f"Weight_decay = {config.TRAIN.WEIGHT_DECAY}",
        f"Drop_path = {config.MODEL.DROP_PATH_RATE}",
        f"Drop_rate = {config.MODEL.DROP_RATE}",
        f"Attention Drop = {config.MODEL.ATTN_DROP_RATE}",
        f"tversky alpha = {config.TRAIN.TVERSKY_LOSS_ALPHA}",
        f"tversky beta = {config.TRAIN.TVERSKY_LOSS_BETA}",
        f"tversky_bce_mix_factor = {config.TRAIN.LOSS_TVERSKY_BCE_MIX}",
        f"base_lr = {config.TRAIN.BASE_LR}",
        f"DYNAMIC_LOADER = {config.DYNAMIC_LOADER}",
        f"warm_up = {config.TRAIN.WARMUP_EPOCHS}",
        f"epochs = {config.TRAIN.MAX_EPOCHS}",
        f"seed = {config.SEED}",
        f"pretrained weights = {config.MODEL.PRETRAIN_WEIGHTS}",
        f"SAVE_BEST_RUN = {config.SAVE_BEST_RUN}",
        f"SHOW_PREDICTIONS = {config.SHOW_PREDICTIONS}",
    ):
        print(line)


def main(argv=None) -> str:
    from ..utils import apply_platform_override

    apply_platform_override()
    from ..core.config import get_config
    from ..models import MSUNet
    from ..train.trainer import trainer

    args = build_arg_parser().parse_args(argv)
    config = get_config(args, True, False)

    now = datetime.now()
    timestamp_str = now.strftime("%d%m%y_%H%M")
    print(f"time: {timestamp_str}")
    echo_hyperparameters(config)

    output_dir, writer = setup_run_dir_and_logging(config, args.cfg)
    logging.info(f"date: {timestamp_str}")

    seed = int(config.SEED)
    random.seed(seed)
    np.random.seed(seed)

    model = MSUNet.from_config(config)

    # Trainer builds the params; pretrained ingestion happens through the
    # converter on the initialized state.
    pretrained_params = None
    kind = str(config.MODEL.PRETRAIN_WEIGHTS)
    if kind not in ("segface", "imagenet1k", "none", ""):
        raise ValueError(f"Could not load pretrained weights: unknown kind "
                         f"{kind!r}")

    import jax
    import jax.numpy as jnp
    from ..train.state import create_train_state
    from ..train.optim import build_optimizer

    rng = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1, config.DATA.IMG_SIZE, config.DATA.IMG_SIZE, 3),
                       model.dtype)
    state = create_train_state(model, config, rng, sample)

    if kind in ("segface", "imagenet1k"):
        from ..models.weight_convert import load_pretrained_encoder

        ckpt_path = (config.MODEL.PRETRAIN_SEGFACE if kind == "segface"
                     else config.MODEL.PRETRAIN_IMAGENET1K)
        new_params = load_pretrained_encoder(
            state.params, ckpt_path, kind, logging
        )
        state = state.replace(params=new_params)

    if bool(config.MODEL.FREEZE_ENCODER):
        tx = build_optimizer(config, state.params, set(range(4)), True)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

    trainer_dic = {"SegArtifact": trainer}
    trainer_dic["SegArtifact"](
        model, logging, writer, output_dir, config,
        config.TRAIN.BASE_LR, state=state, resume_from=args.resume,
    )
    return timestamp_str


if __name__ == "__main__":
    main()
