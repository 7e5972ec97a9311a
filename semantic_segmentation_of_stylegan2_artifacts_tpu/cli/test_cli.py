"""``python test.py --cfg … --check_point_dir … --out_dir …`` — evaluation.

Mirrors the reference (reference ``test.py:36-224``): loads the best
checkpoint (this framework's ``best_model.msgpack`` or a reference
``best_model.pth`` torch payload via the converter — accepting
``{'model':…}``, ``{'state_dict':…}`` or a bare state-dict), evaluates the
test split with the full metric pass, and exports per-case prediction
PNGs with the reference's test-side binary threshold 0.4
(``test.py:206`` vs 0.5 in the trainer).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import shutil

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--check_point_dir", type=str, required=True,
                        help="dir or file holding the best checkpoint")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--tile", type=int, default=0,
                        help="evaluate full-size images through a model of "
                             "this native size via sliding-window inference")
    parser.add_argument("--tile_overlap", type=float, default=0.5)
    return parser


def _resolve_checkpoint(path: str) -> str:
    if os.path.isdir(path):
        for name in ("best_model.msgpack", "best_model.pth",
                     "best_model.orbax"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return cand
        if path.endswith(".orbax"):  # the dir IS an orbax checkpoint
            return path
        raise FileNotFoundError(f"No best_model checkpoint in {path}")
    return path


def main(argv=None):
    from ..utils import apply_platform_override

    apply_platform_override()
    from ..core.config import get_config
    from ..data.dataset import SegArtifactDataset
    from ..data.pipeline import EvalLoader
    from ..models import MSUNet
    from ..train.checkpoint import load_best
    from ..train.state import make_eval_step
    from ..train.trainer import validate
    from ..metrics.csv_logger import CSVHandler
    from ..viz.maps import create_bin_heat_mask_from_list

    args = build_arg_parser().parse_args(argv)
    config = get_config(args, False, True)

    os.makedirs(args.out_dir, exist_ok=True)
    shutil.copy(args.cfg, os.path.join(args.out_dir, "config_used.yaml"))
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    logging.basicConfig(
        filename=os.path.join(args.out_dir, "log.txt"),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
    )

    seed = int(config.SEED)
    random.seed(seed)
    np.random.seed(seed)

    import jax
    import jax.numpy as jnp
    from ..train.state import create_train_state

    img_size = config.DATA.IMG_SIZE
    model_size = args.tile if args.tile else img_size
    model = MSUNet.from_config(config, img_size=model_size)
    state = create_train_state(
        model, config, jax.random.PRNGKey(seed),
        jnp.zeros((1, model_size, model_size, 3), model.dtype),
    )

    ckpt = _resolve_checkpoint(args.check_point_dir)
    if ckpt.endswith((".pth", ".pt")):
        from ..models.weight_convert import (
            convert_msunet_state_dict,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(ckpt)
        # reference payloads prefix module keys with 'ms_unet.'
        sd = {k[len("ms_unet."):] if k.startswith("ms_unet.") else k: v
              for k, v in sd.items()}
        params = convert_msunet_state_dict(sd, state.params, logging)
    else:
        payload = load_best(ckpt, params_target=state.params)
        params = payload["model"]
        logging.info(
            f"loaded checkpoint from epoch {payload.get('epoch')} "
            f"(score {payload.get('best_score')})"
        )

    num_classes = int(config.MODEL.NUM_CLASSES)
    db = SegArtifactDataset(config.DATA.DATA_PATH, config.LIST_DIR, args.split)
    loader = EvalLoader(db, img_size=img_size, num_classes=num_classes)

    alpha = float(config.TRAIN.TVERSKY_LOSS_ALPHA)
    beta = float(config.TRAIN.TVERSKY_LOSS_BETA)
    mix = float(config.TRAIN.LOSS_TVERSKY_BCE_MIX)
    eval_step = make_eval_step(model, alpha, beta, mix,
                               num_classes=num_classes)

    csv_handler = CSVHandler(args.out_dir)
    if args.tile:
        # sliding-window evaluation at full resolution
        from ..metrics.segmentation import (
            MetricsAggregator, compute_case_metrics_jit,
            compute_case_metrics_multiclass_jit, to_case_metrics,
        )
        from ..train.inference import tiled_predict
        from ..train.state import make_predict_step

        predict_step = make_predict_step(model, num_classes=num_classes)
        agg = MetricsAggregator()
        output_saver = []
        for batch in loader:
            probs = tiled_predict(
                predict_step, params, batch["image"][0],
                tile=args.tile, overlap=args.tile_overlap,
            )
            case_name = batch["case_name"][0]
            case_metrics = (compute_case_metrics_jit if num_classes <= 1
                            else compute_case_metrics_multiclass_jit)
            m = case_metrics(
                jnp.asarray(probs), jnp.asarray(batch["label"][0]),
                float(config.TEST.SIG_THRESHOLD),
            )
            agg.add(to_case_metrics(case_name, m, float("nan")))
            output_saver.append((case_name, probs))
        summary = agg.summarize(epoch=0)
        csv_handler.write_epoch(summary)
        mean_dice, score, fpr = (summary.mean_soft_dice, summary.score,
                                 summary.mean_fpr)
    else:
        mean_dice, output_saver, score, fpr, summary = validate(
            eval_step, params, loader, epoch=0,
            sig_threshold=float(config.TEST.SIG_THRESHOLD),
            output_num=len(loader),
            logger=logging, csv_handler=csv_handler,
            num_classes=num_classes, collapse_probs=False,
        )
    csv_handler.close_files()

    pred_dir = os.path.join(args.out_dir, "predictions")
    if num_classes > 1:
        # multi-class extension: per-pixel argmax class map, plus the
        # binary-style exports of the max-over-classes probability
        from ..viz.maps import export_class_maps

        export_class_maps(
            [(c, p) for c, p in output_saver if np.asarray(p).ndim == 3],
            pred_dir, bg_threshold=float(config.TEST.SIG_THRESHOLD),
        )
        output_saver = [
            (c, np.asarray(p).max(axis=-1) if np.asarray(p).ndim == 3
             else np.asarray(p))
            for c, p in output_saver
        ]
    # reference exports binary masks at threshold 0.4 here (test.py:206)
    # and a copy of the original image per case (test.py:209)
    create_bin_heat_mask_from_list(
        output_saver, pred_dir, config.DATA.DATA_PATH, threshold=0.4,
        include_original=True,
    )
    logging.info(
        f"TEST mean_dice={mean_dice:.5f} Score={score:.5f} FPR={fpr:.5f}"
    )
    try:  # TB scalars (reference test.py:173-175)
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(args.out_dir, "log"))
        writer.add_scalar("test/mean_dice", mean_dice, 0)
        writer.add_scalar("test/Score", score, 0)
        writer.add_scalar("test/FPR", fpr, 0)
        writer.close()
    except Exception:
        pass
    print(f"mean_soft_dice {mean_dice:.5f} Score {score:.5f} FPR {fpr:.5f}")
    return mean_dice, score, fpr


if __name__ == "__main__":
    main()
