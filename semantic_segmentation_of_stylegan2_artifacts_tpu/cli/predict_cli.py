"""``python predict.py --cfg … --check_point_dir … --out_dir …`` —
label-free batch inference.

Exposes the reference's label-free capability
(``SegArtifact_no_label_dataset`` + ``atrifact_prediction``,
reference ``dataset/dataset.py:166-209`` /
``scripts/validation_functions.py:312-357``) as a CLI: runs the model
over a split (or every image in the data dirs), exporting per-case grey
heatmaps, binary masks and overlays.  ``--tile`` enables sliding-window
inference for images larger than the model's native size.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--check_point_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--tile_overlap", type=float, default=0.5)
    return p


def main(argv=None):
    from ..utils import apply_platform_override

    apply_platform_override()
    import jax
    import jax.numpy as jnp

    from ..core.config import get_config
    from ..data.dataset import SegArtifactNoLabelDataset
    from ..data.pipeline import EvalLoader
    from ..models import MSUNet
    from ..train.checkpoint import load_best
    from ..train.inference import artifact_prediction, tiled_predict
    from ..train.state import create_train_state, make_predict_step
    from ..viz.maps import create_bin_heat_mask_from_list

    args = build_arg_parser().parse_args(argv)
    config = get_config(args, False, True)
    os.makedirs(args.out_dir, exist_ok=True)
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    logging.basicConfig(
        filename=os.path.join(args.out_dir, "log.txt"), level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S",
    )

    img_size = config.DATA.IMG_SIZE
    model_size = args.tile if args.tile else img_size
    model = MSUNet.from_config(config, img_size=model_size)
    state = create_train_state(
        model, config, jax.random.PRNGKey(int(config.SEED)),
        jnp.zeros((1, model_size, model_size, 3), model.dtype),
    )

    ckpt = args.check_point_dir
    if os.path.isdir(ckpt):
        pth = os.path.join(ckpt, "best_model.pth")
        if os.path.exists(pth):
            ckpt = pth
        # otherwise load_best resolves msgpack/orbax inside the directory
    if ckpt.endswith((".pth", ".pt")):
        from ..models.weight_convert import (
            convert_msunet_state_dict, load_torch_state_dict,
        )

        sd = load_torch_state_dict(ckpt)
        sd = {k[len("ms_unet."):] if k.startswith("ms_unet.") else k: v
              for k, v in sd.items()}
        params = convert_msunet_state_dict(sd, state.params, logging)
    else:
        params = load_best(ckpt, params_target=state.params)["model"]

    ds = SegArtifactNoLabelDataset(config.DATA.DATA_PATH, config.LIST_DIR,
                                   args.split)
    num_classes = int(config.MODEL.NUM_CLASSES)
    loader = EvalLoader(ds, img_size=img_size, num_classes=num_classes)
    predict_step = make_predict_step(model, num_classes=num_classes)

    if args.tile:
        preds = []
        for batch in loader:
            pm = tiled_predict(predict_step, params, batch["image"][0],
                               tile=args.tile, overlap=args.tile_overlap)
            preds.append((batch["case_name"][0], pm))
    else:
        preds = artifact_prediction(predict_step, params, loader)

    if num_classes > 1:
        # multi-class: argmax class maps + binary-style exports of the
        # max-over-classes probability (same routing as test_cli)
        from ..viz.maps import export_class_maps

        export_class_maps(
            [(c, p) for c, p in preds if np.asarray(p).ndim == 3],
            args.out_dir, bg_threshold=float(args.threshold),
        )
        preds = [(c, np.asarray(p).max(axis=-1) if np.asarray(p).ndim == 3
                  else np.asarray(p)) for c, p in preds]

    written = create_bin_heat_mask_from_list(
        preds, args.out_dir, config.DATA.DATA_PATH,
        threshold=float(args.threshold),
    )
    logging.info(f"predicted {len(preds)} cases, wrote {len(written)} files")
    print(f"predicted {len(preds)} cases -> {args.out_dir}")
    return preds


if __name__ == "__main__":
    main()
