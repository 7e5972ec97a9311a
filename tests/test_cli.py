"""End-to-end CLI tests: train.py then test.py over a synthetic dataset,
driven through the real command-line surface (subprocess)."""

import csv
import os
import subprocess
import sys

import pytest
import yaml

from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg(root, out_dir):
    return {
        "BASE": [],
        "DATA": {"BATCH_SIZE": 2, "DATA_PATH": root, "IMG_SIZE": 64,
                 "NUM_WORKERS": 2},
        "MODEL": {
            "PRETRAIN_WEIGHTS": "none",
            "FREEZE_ENCODER": False,
            "ATTN_DROP_RATE": 0.0,
            "SWIN": {"EMBED_DIM": 16, "DEPTHS": [1, 1, 1, 1],
                     "NUM_HEADS": [2, 2, 2, 2], "WINDOW_SIZE": 4},
        },
        "TRAIN": {"MAX_EPOCHS": 1, "WARMUP_EPOCHS": 0, "BASE_LR": 1e-4},
        "TPU": {"COMPUTE_DTYPE": "float32"},
        "OUTPUT_DIR": out_dir,
        "LIST_DIR": os.path.join(root, "lists"),
        "SEED": 11,
        "SHOW_PREDICTIONS": 2,
        "SAVE_BEST_RUN": True,
    }


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    root = str(base / "data")
    generate_synthetic_dataset(root, img_size=64)
    out_dir = str(base / "run_out")
    cfg_path = str(base / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_tiny_cfg(root, out_dir), f)
    env = dict(os.environ, SSA_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "train.py", "--cfg", cfg_path],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return base, root, out_dir, cfg_path, env, proc


def test_train_cli_outputs(trained_run):
    _, root, out_dir, _, _, proc = trained_run
    # hyperparameter echo on stdout (reference train.py:43-58)
    assert "tversky alpha" in proc.stdout
    # run dir artifacts
    assert os.path.exists(os.path.join(out_dir, "config_used.yaml"))
    assert os.path.exists(os.path.join(out_dir, "log.txt"))
    assert os.path.exists(os.path.join(out_dir, "best_model.msgpack"))
    with open(os.path.join(out_dir, "val_metric_all_epoch.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2 and rows[0][-1] == "Score"
    log = open(os.path.join(out_dir, "log.txt")).read()
    assert "mean_soft_dice" in log
    preds = os.listdir(os.path.join(out_dir, "final_preds"))
    assert any(p.endswith("_grey_heats.png") for p in preds)


def test_test_cli_evaluates_checkpoint(trained_run):
    base, root, out_dir, cfg_path, env, _ = trained_run
    eval_dir = str(base / "eval_out")
    proc = subprocess.run(
        [sys.executable, "test.py", "--cfg", cfg_path,
         "--check_point_dir", out_dir, "--out_dir", eval_dir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "mean_soft_dice" in proc.stdout
    assert os.path.exists(os.path.join(eval_dir, "log.txt"))
    preds = os.listdir(os.path.join(eval_dir, "predictions"))
    # 3 test cases x 5 exports (grey heat, bin mask, original copy,
    # color heatmap, contour overlay — reference test.py:183-224)
    assert len([p for p in preds if p.endswith(".png")]) == 15
    cases = [p[: -len("_grey_heats.png")] for p in preds
             if p.endswith("_grey_heats.png")]
    assert len(cases) == 3
    for case in cases:
        assert f"{case}.png" in preds          # original image copy
        assert f"{case}_heatmap.png" in preds  # color heatmap (test naming)
        assert f"{case}_overlay_color.png" in preds  # contour overlay


def test_train_cli_rejects_missing_cfg():
    proc = subprocess.run(
        [sys.executable, "train.py", "--cfg", "/nonexistent.yaml"],
        cwd=REPO, env=dict(os.environ, SSA_TPU_PLATFORM="cpu"),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0


def test_predict_cli(trained_run, tmp_path_factory):
    """predict.py: label-free inference + exports over the test split."""
    base, root, out_dir, cfg_path, env, _ = trained_run
    pred_dir = str(base / "predict_out")
    proc = subprocess.run(
        [sys.executable, "predict.py", "--cfg", cfg_path,
         "--check_point_dir", out_dir, "--out_dir", pred_dir,
         "--split", "test"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "predicted 3 cases" in proc.stdout
    files = os.listdir(pred_dir)
    assert sum(f.endswith("_grey_heats.png") for f in files) == 3
    assert sum(f.endswith("_bin_mask.png") for f in files) == 3


def test_best_score_from_csv(tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.cli.run_cli import (
        best_score_from_csv,
    )

    p = tmp_path / "val_metric_all_epoch.csv"
    p.write_text(
        "epoch,mean_val_loss,Score\n"
        "1,0.9,-3.2\n"
        "2,0.8,-1.5\n"
        "3,0.7\n"            # short row from an interrupted writer
        "4,0.6,not_a_number\n"
        "5,0.5,-2.0\n"
    )
    assert best_score_from_csv(p) == -1.5
    # missing column -> None
    assert best_score_from_csv(p, column="Dice") is None
    # missing file -> None (tolerated, matches trial-crash semantics)
    assert best_score_from_csv(tmp_path / "nope.csv") is None
    # no numeric rows -> None
    q = tmp_path / "empty.csv"
    q.write_text("epoch,Score\n")
    assert best_score_from_csv(q) is None


def test_run_sweep_parallel_trials(tmp_path):
    """--jobs>1: per-trial config copies, slot envs, correct argmax."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.cli.run_cli import (
        run_sweep,
    )

    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        "OUTPUT_DIR: './out'\n"
        "TRAIN:\n  TVERSKY_LOSS_ALPHA: 0.2\n  TVERSKY_LOSS_BETA: 0.8\n"
    )
    # stub train.py: reads its cfg, scores Score = ALPHA + slot/100
    stub = tmp_path / "stub_train.py"
    stub.write_text(
        "import argparse, os, re, sys\n"
        "ap = argparse.ArgumentParser(); ap.add_argument('--cfg')\n"
        "a = ap.parse_args()\n"
        "text = open(a.cfg).read()\n"
        "out = re.search(r\"OUTPUT_DIR: '?([^'\\n]+)'?\", text).group(1)\n"
        "alpha = float(re.search(r'TVERSKY_LOSS_ALPHA: ([0-9.]+)', text)"
        ".group(1))\n"
        "slot = int(os.environ.get('TRIAL_SLOT', '0'))\n"
        "os.makedirs(out, exist_ok=True)\n"
        "with open(os.path.join(out, 'val_metric_all_epoch.csv'), 'w') as f:\n"
        "    f.write('epoch,Score\\n1,%s\\n' % (alpha + slot / 100.0))\n"
    )
    import sys

    trials = [
        (alpha, tmp_path / f"trial_{alpha}",
         [("TRAIN.TVERSKY_LOSS_ALPHA", alpha)])
        for alpha in (0.1, 0.5, 0.3)
    ]
    scores = run_sweep(trials, sys.executable, str(stub), str(cfg),
                       jobs=2, slot_env=["TRIAL_SLOT={slot}"])
    assert set(scores) == {0.1, 0.5, 0.3}
    assert max(scores, key=scores.get) == 0.5
    # per-trial config copies exist and the shared config was not mutated
    for alpha in (0.1, 0.5, 0.3):
        assert (tmp_path / f"trial_{alpha}" / "trial_config.yaml").exists()
    assert "TVERSKY_LOSS_ALPHA: 0.2" in cfg.read_text()
    # slot envs were applied (some trial got slot 1's +0.01 bump)
    assert any(abs(v - (k + 0.01)) < 1e-9 for k, v in scores.items())
