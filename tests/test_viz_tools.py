"""Visualization, tools, and inference-utility tests."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("viz_synth"))
    generate_synthetic_dataset(root, img_size=32)
    return root


# ---------------------------------------------------------------------------
# viz.maps
# ---------------------------------------------------------------------------
def test_create_bin_heat_mask_exports(synth_root, tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz import (
        create_bin_heat_mask_from_list,
    )

    heat = np.zeros((32, 32), np.float32)
    heat[4:10, 4:10] = 0.9
    out = str(tmp_path / "preds")
    written = create_bin_heat_mask_from_list(
        [("090000", heat), ("10000", heat)], out, synth_root, threshold=0.5
    )
    assert len(written) == 8
    bin_mask = np.asarray(Image.open(os.path.join(out, "090000_bin_mask.png")))
    assert bin_mask[5, 5] == 255 and bin_mask[20, 20] == 0
    grey = np.asarray(Image.open(os.path.join(out, "090000_grey_heats.png")))
    assert abs(int(grey[5, 5]) - int(0.9 * 255)) <= 1


def test_overlay_and_contour(tmp_path, synth_root):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz import (
        overlay_mask_on_image,
        save_contour_heatmap,
    )

    img = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:16, 8:16] = 1
    out = overlay_mask_on_image(img, mask)
    # magenta fill visible inside the mask
    assert out[12, 12, 0] > 0 and out[12, 12, 2] > 0
    p = str(tmp_path / "contour.png")
    save_contour_heatmap(img, mask.astype(np.float32) * 0.95, p)
    assert os.path.exists(p)


# ---------------------------------------------------------------------------
# viz.plots
# ---------------------------------------------------------------------------
def test_plot_lr_range_and_per_epoch(tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz.plots import (
        plot_lr_range,
        plot_per_epoch,
    )

    lr_csv = tmp_path / "lr_range_test.csv"
    with open(lr_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "lr", "train_loss", "val_loss"])
        for i in range(30):
            w.writerow([i, 10 ** (-6 + i * 0.1), 1.0 / (i + 1), 1.1 / (i + 1)])
    out = plot_lr_range(str(lr_csv), str(tmp_path))
    assert os.path.exists(out)

    epoch_csv = tmp_path / "val_metric_all_epoch.csv"
    with open(epoch_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "mean_accuracy", "mean_val_loss",
                    "mean_train_loss", "mean_confusion_matrix_bin",
                    "mean_confusion_matrix_soft", "Score"])
        for e in range(3):
            w.writerow([e + 1, 0.9, 0.5 - e * 0.1, 0.6 - e * 0.1, "[]", "[]",
                        -1 + e * 0.3])
    out2 = plot_per_epoch(str(tmp_path))
    assert os.path.exists(out2)


# ---------------------------------------------------------------------------
# viz.eval_overlays
# ---------------------------------------------------------------------------
def test_tp_fp_fn_overlays(tmp_path, synth_root):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz.eval_overlays import (
        overlay_predictions_with_masks,
        tp_fp_fn_composite,
    )

    pred = np.zeros((8, 8), bool); pred[:4, :4] = True
    gt = np.zeros((8, 8), bool); gt[2:6, 2:6] = True
    comp = tp_fp_fn_composite(pred, gt)
    assert tuple(comp[3, 3]) == (0, 255, 0)   # TP
    assert tuple(comp[0, 0]) == (255, 0, 0)   # FP
    assert tuple(comp[5, 5]) == (0, 0, 255)   # FN
    assert tuple(comp[7, 7]) == (0, 0, 0)     # TN

    # end-to-end over exported predictions
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    gt_mask = np.asarray(Image.open(
        os.path.join(synth_root, "fake_labels", "090000_mask.png")))
    Image.fromarray(gt_mask, "L").save(pred_dir / "090000_grey_heats.png")
    dices = overlay_predictions_with_masks(str(pred_dir), synth_root,
                                           str(tmp_path / "ov"))
    assert abs(dices["090000"] - 1.0) < 1e-6  # perfect prediction
    assert os.path.exists(tmp_path / "ov" / "090000_tp_fp_fn.png")


# ---------------------------------------------------------------------------
# viz.artifact_distribution
# ---------------------------------------------------------------------------
def test_artifact_distribution(synth_root, tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz.artifact_distribution import (
        average_mask_heatmap,
        create_heatmap,
    )

    heat = average_mask_heatmap(os.path.join(synth_root, "fake_labels"))
    assert heat.shape == (32, 32)
    assert 0.0 <= heat.min() and heat.max() <= 1.0 and heat.max() == 1.0
    hn = average_mask_heatmap(os.path.join(synth_root, "fake_labels"),
                              normalize_per_mask=True)
    assert hn.max() == 1.0
    out = create_heatmap(os.path.join(synth_root, "fake_labels"),
                         str(tmp_path / "dist.png"))
    assert os.path.exists(out)


# ---------------------------------------------------------------------------
# tools
# ---------------------------------------------------------------------------
def test_dataset_check(synth_root):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.tools.dataset_check import (
        check_dataset,
    )

    info = check_dataset(synth_root, os.path.join(synth_root, "lists"),
                         img_size=32, verbose=False)
    assert info["n_samples"] == 10
    assert info["label_values"] in ([0, 1], [0])


def test_ckpt_inspect(tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.tools.ckpt_inspect import (
        diff_dumps,
        dump_keys,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.checkpoint import (
        save_checkpoint,
    )

    tree = {"a": {"kernel": np.zeros((3, 4))}, "b": {"bias": np.zeros((4,))}}
    p = str(tmp_path / "x.msgpack")
    save_checkpoint(p, tree)
    rows = dump_keys(p)
    assert ("a.kernel", (3, 4)) in rows
    assert ("b.bias", (4,)) in rows
    matches = diff_dumps(rows, rows)
    assert matches["a.kernel"] == ["a.kernel"]

    import torch
    tp = str(tmp_path / "y.pth")
    torch.save({"w": torch.zeros(2, 2)}, tp)
    rows2 = dump_keys(tp)
    assert rows2 == [("w", (2, 2))]


# ---------------------------------------------------------------------------
# inference utils
# ---------------------------------------------------------------------------
def test_validation_loss_and_prediction(synth_root):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.dataset import (
        SegArtifactDataset,
        SegArtifactNoLabelDataset,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.pipeline import (
        EvalLoader,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
        create_train_state,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.inference import (
        artifact_prediction,
        validation_loss,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
        make_eval_step,
        make_predict_step,
    )

    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(1, 1, 1, 1), window_size=4)
    c = default_config(); c.defrost(); c.DATA.IMG_SIZE = 32
    state = create_train_state(model, c, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    lists = os.path.join(synth_root, "lists")
    val = EvalLoader(SegArtifactDataset(synth_root, lists, "val"), img_size=32)
    ev = make_eval_step(model, 0.2, 0.8, 0.45)
    loss = validation_loss(ev, state.params, val)
    assert np.isfinite(loss)
    loss2 = validation_loss(ev, state.params, val, bool_break=True, n_batches=1)
    assert np.isfinite(loss2)

    nl = EvalLoader(SegArtifactNoLabelDataset(synth_root, lists, "val"),
                    img_size=32)
    preds = artifact_prediction(make_predict_step(model), state.params, nl)
    assert len(preds) == 3
    name, pm = preds[0]
    assert pm.shape == (32, 32)
    assert 0.0 <= pm.min() and pm.max() <= 1.0


def test_tiled_predict_blends_seamlessly():
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.inference import (
        tile_grid,
        tiled_predict,
    )

    assert tile_grid(64, 32, 16) == [0, 16, 32]
    assert tile_grid(60, 32, 16) == [0, 16, 28]
    assert tile_grid(32, 64, 32) == [0]

    # fake predictor: probability = mean channel intensity of the tile pixel
    def predict_step(params, tiles):
        return jnp.mean(tiles.astype(jnp.float32) / 255.0, axis=-1)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (80, 96, 3), np.uint8)
    out = tiled_predict(predict_step, None, img, tile=32, overlap=0.5)
    assert out.shape == (80, 96)
    want = img.astype(np.float32).mean(-1) / 255.0
    # per-pixel predictor must be reproduced exactly up to blending error
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_tiled_predict_multiclass_channels():
    """(B,t,t,C) per-class maps blend channel-wise to (H,W,C)."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.inference import (
        tiled_predict,
    )

    # fake per-class predictor: class c map = channel-c intensity
    def predict_step(params, tiles):
        return tiles.astype(jnp.float32) / 255.0

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 80, 3), np.uint8)
    out = tiled_predict(predict_step, None, img, tile=32, overlap=0.5)
    assert out.shape == (64, 80, 3)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-4)


def test_save_class_map_and_export(tmp_path):
    """Argmax class map: palette colors, background gating, file export."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.viz.maps import (
        _CLASS_PALETTE,
        export_class_maps,
        save_class_map,
    )

    probs = np.zeros((4, 4, 3), np.float32)
    probs[0, 0] = (0.1, 0.9, 0.2)   # class 1 wins confidently
    probs[1, 1] = (0.2, 0.1, 0.8)   # class 2 wins confidently
    probs[2, 2] = (0.1, 0.3, 0.2)   # low confidence -> background
    rgb = save_class_map(probs, str(tmp_path / "cm.png"), bg_threshold=0.5)
    assert tuple(rgb[0, 0]) == tuple(_CLASS_PALETTE[1])
    assert tuple(rgb[1, 1]) == tuple(_CLASS_PALETTE[2])
    assert tuple(rgb[2, 2]) == tuple(_CLASS_PALETTE[0])
    written = export_class_maps([("case1", probs)], str(tmp_path / "d"))
    import os
    assert all(os.path.exists(w) for w in written)
    assert written[0].endswith("case1_class_map.png")


def test_step_timer():
    from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.profiling import (
        StepTimer,
    )
    import time as _t

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step():
            _t.sleep(0.01)
    assert len(t.times) == 3
    assert 0.005 < t.mean_s < 0.1
    assert t.images_per_sec(2) > 0
