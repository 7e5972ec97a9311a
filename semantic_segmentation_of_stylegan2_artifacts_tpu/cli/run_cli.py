"""``python run.py`` — sequential hyperparameter grid search.

Mirrors the reference driver (reference ``run.py``): three sweeps in
order (attention-dropout -> Tversky alpha (beta = 1 - alpha) ->
learning-rate), each trial mutating ``config.yaml`` in place through the
round-trip editor, shelling out to ``train.py``, then ranking trials by
the max of the ``Score`` column in ``val_metric_all_epoch.csv``.
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

from ..core.yaml_editor import ConfigParser

CSV_NAME = "val_metric_all_epoch.csv"
METRIC_COL = "Score"


def best_score_from_csv(path: Path, column: str = METRIC_COL) -> Optional[float]:
    """Max numeric value of ``column`` in a per-epoch CSV, or None.

    Trial ranking must survive a trial that crashed mid-epoch, so every
    failure mode degrades to None rather than raising: unreadable file,
    absent header, short/garbled rows (a partially flushed writer), and
    non-numeric cells are all skipped.
    """
    best: Optional[float] = None
    try:
        with open(path, newline="") as fh:
            for row in csv.DictReader(fh):
                cell = (row or {}).get(column)
                try:
                    value = float(cell)
                except (TypeError, ValueError):
                    continue
                if value == value and (best is None or value > best):
                    best = value
    except OSError as e:
        print(f"[WARN] could not read {path}: {e}")
        return None
    return best


def run_trial(cfg_path: str, out_dir: Path, overrides, python: str,
              train_py: str, env=None) -> float:
    out_dir.mkdir(parents=True, exist_ok=True)
    parser = ConfigParser(cfg_path)
    parser.set_value("OUTPUT_DIR", str(out_dir))
    for path, value in overrides:
        parser.set_value(path, value)
    parser.save()
    cmd = [python, train_py, "--cfg", cfg_path]
    print("CMD:", " ".join(cmd))
    subprocess.run(cmd, env=env or os.environ.copy(), check=True)
    best = best_score_from_csv(out_dir / CSV_NAME)
    if best is None:
        raise ValueError(
            f"trial produced no usable '{METRIC_COL}' column in "
            f"{out_dir / CSV_NAME}"
        )
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="./config.yaml")
    ap.add_argument("--root_out", default="./model_out/RUN1")
    ap.add_argument("--train_py", default="train.py")
    ap.add_argument("--python", default=sys.executable)
    ap.add_argument("--attn_drop", type=float, nargs="+", default=[0.1])
    ap.add_argument("--alpha", type=float, nargs="+", default=[0.3, 0.4])
    ap.add_argument("--lr", type=float, nargs="+", default=[8.5e-6, 3e-5])
    ap.add_argument("--weight_decay", type=float, default=0.001)
    ap.add_argument("--drop_path", type=float, default=0.1)
    ap.add_argument("--drop_rate", type=float, default=0.0)
    args = ap.parse_args(argv)

    root_out = Path(args.root_out)
    root_out.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(filename=str(root_out / "run.log"), level=logging.DEBUG)

    wd, dp, dr = args.weight_decay, args.drop_path, args.drop_rate
    base = [
        ("TRAIN.WEIGHT_DECAY", wd),
        ("MODEL.DROP_RATE", dr),
        ("MODEL.DROP_PATH_RATE", dp),
    ]

    # -------- sweep 1: attention dropout --------
    logging.info("Attention drop search:")
    scores = {}
    for attn_drop in args.attn_drop:
        out = root_out / (
            f"drop_path{dp:.2f}_drop_rate{dr:.2f}_attn_drop{attn_drop:.2f}"
        )
        score = run_trial(
            args.cfg, out,
            base + [("MODEL.ATTN_DROP_RATE", attn_drop),
                    ("TRAIN.TVERSKY_LOSS_ALPHA", 0.2),
                    ("TRAIN.TVERSKY_LOSS_BETA", 0.8)],
            args.python, args.train_py,
        )
        scores[attn_drop] = score
        logging.info(f"attn_drop {attn_drop}: result {score}")
    best_att = max(scores, key=scores.get)
    logging.info(f"Best attention drop {best_att}")

    # -------- sweep 2: Tversky alpha (beta = 1 - alpha) --------
    logging.info("Alpha refine:")
    scores = {}
    for alpha in args.alpha:
        beta = 1 - alpha
        out = root_out / (
            f"alpha_{alpha:.2f}_drop_path{dp:.2f}_drop_rate{dr:.2f}"
            f"_attn_drop{best_att:.2f}"
        )
        score = run_trial(
            args.cfg, out,
            base + [("MODEL.ATTN_DROP_RATE", best_att),
                    ("TRAIN.TVERSKY_LOSS_ALPHA", alpha),
                    ("TRAIN.TVERSKY_LOSS_BETA", beta)],
            args.python, args.train_py,
        )
        scores[alpha] = score
        logging.info(f"alpha {alpha}: result {score}")
    best_alpha = max(scores, key=scores.get)
    logging.info(f"Best alpha {best_alpha}")

    # -------- sweep 3: learning rate --------
    logging.info("LR search:")
    scores = {}
    for lr in args.lr:
        out = root_out / (
            f"lr_{lr:.2e}_alpha_{best_alpha:.2f}_attn_drop{best_att:.2f}"
        )
        score = run_trial(
            args.cfg, out,
            base + [("MODEL.ATTN_DROP_RATE", best_att),
                    ("TRAIN.TVERSKY_LOSS_ALPHA", best_alpha),
                    ("TRAIN.TVERSKY_LOSS_BETA", 1 - best_alpha),
                    ("TRAIN.BASE_LR", lr)],
            args.python, args.train_py,
        )
        scores[lr] = score
        logging.info(f"lr {lr}: result {score}")
    best_lr = max(scores, key=scores.get)
    logging.info(f"Best lr {best_lr}")
    print(f"BEST: attn_drop={best_att} alpha={best_alpha} lr={best_lr}")
    return best_att, best_alpha, best_lr


if __name__ == "__main__":
    main()
