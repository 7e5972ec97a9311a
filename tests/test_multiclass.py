"""Multi-class loss/metrics + multi-class model output."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_of_stylegan2_artifacts_tpu.losses.losses import (
    dynamic_loss,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.losses.multiclass import (
    dynamic_loss_multiclass,
    macro_dice,
    per_class_dice,
)


def test_multiclass_reduces_to_binary_for_c1():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 8, 8, 1).astype(np.float32)
    y = (rng.rand(3, 8, 8, 1) > 0.6).astype(np.float32)
    a = float(dynamic_loss_multiclass(jnp.asarray(x), jnp.asarray(y),
                                      0.2, 0.8, 0.45))
    b = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y), 0.2, 0.8, 0.45))
    assert abs(a - b) < 1e-6


def test_multiclass_per_class_conditionality():
    """Empty class channels contribute BCE-only per (sample, class)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    y = (rng.rand(2, 8, 8, 3) > 0.5).astype(np.float32)
    y[:, :, :, 1] = 0.0  # class 1 empty everywhere
    loss = float(dynamic_loss_multiclass(jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(loss)
    # per-channel independence: computing channels separately and
    # averaging must agree
    parts = [
        float(dynamic_loss(jnp.asarray(x[..., c]), jnp.asarray(y[..., c])))
        for c in range(3)
    ]
    assert abs(loss - float(np.mean(parts))) < 1e-6


def test_per_class_and_macro_dice():
    probs = np.zeros((8, 8, 2), np.float32)
    labels = np.zeros((8, 8, 2), np.uint8)
    labels[:4, :4, 0] = 1
    probs[:4, :4, 0] = 1.0   # perfect class 0
    labels[4:, 4:, 1] = 1
    probs[:4, 4:, 1] = 1.0   # fully wrong class 1
    d = np.asarray(per_class_dice(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(d[0] - 1.0) < 1e-6
    assert d[1] < 1e-3
    m = float(macro_dice(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(m - float(d.mean())) < 1e-6


def test_multiclass_model_output():
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet

    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(1, 1, 1, 1), window_size=4, num_classes=3)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    out = model.apply(params, x, True)
    assert out.shape == (1, 32, 32, 3)
    # train a multi-class step end to end
    rng = np.random.RandomState(0)
    y = jnp.asarray((rng.rand(1, 32, 32, 3) > 0.7).astype(np.float32))

    def loss_fn(p):
        return dynamic_loss_multiclass(model.apply(p, x, True), y)

    g = jax.grad(lambda p: loss_fn(p))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


def test_multiclass_metrics_macro():
    from semantic_segmentation_of_stylegan2_artifacts_tpu.metrics.segmentation import (
        compute_case_metrics_multiclass_jit,
    )

    label = np.zeros((8, 8), np.uint8)
    label[:4, :4] = 1     # class 1 fg
    label[4:, 4:] = 2     # class 2 fg
    probs = np.zeros((8, 8, 2), np.float32)
    probs[:4, :4, 0] = 0.9     # class 1 perfect
    probs[:4, 4:, 1] = 0.9     # class 2 fully wrong location
    m = compute_case_metrics_multiclass_jit(
        jnp.asarray(probs), jnp.asarray(label), 0.5)
    md = {k: float(v) for k, v in m.items()}
    assert not md["is_real"]
    # macro dice over the 2 present classes: (1.0 + ~0)/2
    assert 0.45 < md["bin_dice"] < 0.55
    # empty-label case is "real"
    m2 = compute_case_metrics_multiclass_jit(
        jnp.asarray(np.zeros((8, 8, 2), np.float32)),
        jnp.asarray(np.zeros((8, 8), np.uint8)), 0.5)
    assert bool(m2["is_real"])


def test_multiclass_trainer_end_to_end(tmp_path):
    import logging
    import os
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

    root = str(tmp_path / "mc_data")
    generate_synthetic_dataset(root, img_size=32, num_classes=3)
    from PIL import Image
    lbl = np.asarray(Image.open(os.path.join(
        root, "fake_labels", "090000_mask.png")))
    assert lbl.max() <= 3  # class ids, not 255

    out_dir = str(tmp_path / "mc_out")
    c = default_config()
    c.defrost()
    c.DATA.DATA_PATH = root
    c.DATA.IMG_SIZE = 32
    c.LIST_DIR = os.path.join(root, "lists")
    c.TRAIN.MAX_EPOCHS = 1
    c.TRAIN.WARMUP_EPOCHS = 0
    c.TRAIN.BASE_LR = 1e-4
    c.MODEL.FREEZE_ENCODER = False
    c.MODEL.NUM_CLASSES = 3
    c.SAVE_BEST_RUN = True
    c.SHOW_PREDICTIONS = 1
    c.DATA.NUM_WORKERS = 2
    c.TPU.COMPUTE_DTYPE = "float32"
    c.freeze()

    model = MSUNet(img_size=32, embed_dim=16, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4, num_classes=3)
    result = trainer(model, logging.getLogger("mc"), None, out_dir, c)
    assert result == "Training Finished!"
    import csv as _csv
    with open(os.path.join(out_dir, "val_metric_all_epoch.csv")) as f:
        rows = list(_csv.reader(f))
    assert len(rows) == 2
    preds = os.listdir(os.path.join(out_dir, "final_preds"))
    assert any(p.endswith("_grey_heats.png") for p in preds)


def test_multiclass_per_sample_loss_matches_batch_mean():
    """Per-sample variant: mean equals the scalar loss; padding droppable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_segmentation_of_stylegan2_artifacts_tpu.losses.multiclass import (
        dynamic_loss_multiclass,
        dynamic_loss_multiclass_per_sample,
    )

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    targets = jnp.asarray((rng.rand(4, 8, 8, 3) > 0.7).astype(np.float32))
    per = dynamic_loss_multiclass_per_sample(logits, targets, 0.3, 0.7, 0.5)
    total = dynamic_loss_multiclass(logits, targets, 0.3, 0.7, 0.5)
    assert per.shape == (4,)
    np.testing.assert_allclose(float(jnp.mean(per)), float(total), rtol=1e-6)
    # a padded (repeated) tail changes the batch mean but not the
    # leading per-sample entries — the padded-eval correctness property
    padded_logits = jnp.concatenate([logits, logits[-1:]], axis=0)
    padded_targets = jnp.concatenate([targets, targets[-1:]], axis=0)
    per_padded = dynamic_loss_multiclass_per_sample(
        padded_logits, padded_targets, 0.3, 0.7, 0.5)
    np.testing.assert_allclose(np.asarray(per_padded[:4]), np.asarray(per),
                               rtol=1e-6)


def test_multiclass_padded_eval_matches_batch1(tmp_path):
    """Padded EVAL_BATCH validation == batch-1 for num_classes > 1.

    Regression for the r2 review finding: the batch-mean multiclass eval
    loss double-weighted the repeated padding rows; the per-sample loss
    variant drops the tail before aggregation.
    """
    import os

    import jax
    import jax.numpy as jnp

    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.dataset import (
        SegArtifactDataset,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.pipeline import (
        EvalLoader,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
        generate_synthetic_dataset,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
        create_train_state,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
        make_eval_step,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.trainer import (
        validate,
    )

    root = str(tmp_path / "mc")
    generate_synthetic_dataset(root, img_size=32, num_classes=3)
    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4, num_classes=3)
    c = default_config()
    c.defrost()
    c.DATA.IMG_SIZE = 32
    c.MODEL.NUM_CLASSES = 3
    state = create_train_state(model, c, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    ev = make_eval_step(model, 0.2, 0.8, 0.45, num_classes=3,
                        per_sample=True)
    ds = SegArtifactDataset(root, os.path.join(root, "lists"), "val")
    out1 = validate(ev, state.params, EvalLoader(ds, img_size=32,
                                                 num_classes=3),
                    1, 0.5, num_classes=3)
    pad_bs = 4
    assert len(ds) % pad_bs != 0, "need a ragged tail"
    padded = EvalLoader(ds, img_size=32, num_classes=3, batch_size=pad_bs,
                        pad_to_batch=True)
    out2 = validate(ev, state.params, padded, 1, 0.5, num_classes=3)
    assert abs(out1[0] - out2[0]) < 1e-6
    assert abs(out1[4].mean_val_loss - out2[4].mean_val_loss) < 1e-5


def test_multiclass_test_cli_exports_class_maps(tmp_path):
    """test.py end-to-end with NUM_CLASSES=3: multiclass metrics route,
    class-map PNGs, and the binary-style exports of the collapsed map —
    in both whole-image and sliding-window (--tile) modes."""
    import logging
    import os
    from semantic_segmentation_of_stylegan2_artifacts_tpu.cli import test_cli
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

    root = str(tmp_path / "mc_data")
    generate_synthetic_dataset(root, img_size=32, num_classes=3)
    out_dir = str(tmp_path / "mc_out")

    cfg_path = str(tmp_path / "mc.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "DATA:\n"
            f"  DATA_PATH: {root}\n"
            "  IMG_SIZE: 32\n"
            "  NUM_WORKERS: 2\n"
            f"LIST_DIR: {os.path.join(root, 'lists')}\n"
            "TRAIN:\n"
            "  MAX_EPOCHS: 1\n"
            "  WARMUP_EPOCHS: 0\n"
            "  BASE_LR: 1.0e-4\n"
            "MODEL:\n"
            "  FREEZE_ENCODER: false\n"
            "  NUM_CLASSES: 3\n"
            "  SWIN:\n"
            "    EMBED_DIM: 16\n"
            "    DEPTHS: [1, 1, 1, 1]\n"
            "    DECODER_DEPTHS: [1, 1, 1, 1]\n"
            "    NUM_HEADS: [2, 2, 2, 2]\n"
            "    WINDOW_SIZE: 4\n"
            "SAVE_BEST_RUN: true\n"
            "SHOW_PREDICTIONS: 1\n"
            "TPU:\n"
            "  COMPUTE_DTYPE: float32\n"
        )

    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        _update_config_from_file,
    )
    c = default_config()
    _update_config_from_file(c, cfg_path)
    model = MSUNet.from_config(c)
    assert trainer(model, logging.getLogger("mc_cli"), None, out_dir,
                   c) == "Training Finished!"

    eval_dir = str(tmp_path / "mc_eval")
    test_cli.main(["--cfg", cfg_path, "--check_point_dir", out_dir,
                   "--out_dir", eval_dir])
    preds = os.listdir(os.path.join(eval_dir, "predictions"))
    cases = [p[: -len("_class_map.png")] for p in preds
             if p.endswith("_class_map.png")]
    assert len(cases) == 3  # every test case gets an argmax class map
    for case in cases:  # plus the full binary-style export set
        assert f"{case}_grey_heats.png" in preds
        assert f"{case}_bin_mask.png" in preds
        assert f"{case}.png" in preds

    # sliding-window mode: the 32-trained model tiles a 64^2 dataset
    root64 = str(tmp_path / "mc_data64")
    generate_synthetic_dataset(root64, img_size=64, num_classes=3)
    cfg64 = str(tmp_path / "mc64.yaml")
    with open(cfg_path) as f:
        body = f.read()
    with open(cfg64, "w") as f:
        f.write(body.replace(f"DATA_PATH: {root}", f"DATA_PATH: {root64}")
                .replace("IMG_SIZE: 32", "IMG_SIZE: 64")
                .replace(os.path.join(root, 'lists'),
                         os.path.join(root64, 'lists')))
    tile_dir = str(tmp_path / "mc_eval_tile")
    test_cli.main(["--cfg", cfg64, "--check_point_dir", out_dir,
                   "--out_dir", tile_dir, "--tile", "32"])
    tpreds = os.listdir(os.path.join(tile_dir, "predictions"))
    assert sum(p.endswith("_class_map.png") for p in tpreds) == 3
