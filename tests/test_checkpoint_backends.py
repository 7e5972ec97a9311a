"""Checkpoint backends: msgpack/orbax x sync/async (CheckpointWriter).

The reference has exactly one checkpoint format (``torch.save`` dicts,
reference ``trainer.py:361-385``); this framework adds a directory-based
orbax backend (sharding-aware, multi-host-safe) and an async mode that
overlaps D2H + serialization with the next epoch's compute.
"""

import csv
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.train.checkpoint import (
    CheckpointWriter,
    load_best,
    read_checkpoint_auto,
)


def _params():
    return {
        "dense": {"kernel": jnp.arange(12, dtype=jnp.bfloat16).reshape(3, 4),
                  "bias": jnp.ones((4,), jnp.float32)},
    }


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.asarray(x).dtype == np.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_writer_msgpack_async_roundtrip(tmp_path):
    """Async msgpack: in-order saves, wait() makes them durable."""
    w = CheckpointWriter(backend="msgpack", async_=True)
    p0 = w.save_best(str(tmp_path), _params(), epoch=1, best_score=0.3)
    better = jax.tree.map(lambda x: x + 1, _params())
    p1 = w.save_best(str(tmp_path), better, epoch=2, best_score=0.7)
    assert p0 == p1  # same best path, second write wins (FIFO worker)
    w.save_last(str(tmp_path), 2, better, {"count": jnp.zeros(())}, 10, 0.7)
    w.close()

    payload = load_best(str(tmp_path), params_target=_params())
    assert payload["epoch"] == 2 and abs(payload["best_score"] - 0.7) < 1e-9
    _assert_tree_equal(payload["model"], better)
    raw = read_checkpoint_auto(os.path.join(str(tmp_path), "epoch_2.msgpack"))
    assert int(raw["iter_num"]) == 10


def test_writer_orbax_roundtrip(tmp_path):
    """Orbax backend: directory checkpoint, dtype-exact restore, and a
    full optimizer-state roundtrip through the state-dict form (exercises
    optax namedtuples + masked frozen-stage nodes)."""
    import optax
    from flax import serialization

    w = CheckpointWriter(backend="orbax")
    path = w.save_best(str(tmp_path), _params(), epoch=3, best_score=0.5)
    assert path.endswith("best_model.orbax") and os.path.isdir(path)

    # load via the containing directory (CLI-style) and via the ckpt dir
    for loc in (str(tmp_path), path):
        payload = load_best(loc, params_target=_params())
        assert int(payload["epoch"]) == 3
        _assert_tree_equal(payload["model"], _params())

    params = _params()
    tx = optax.multi_transform(
        {"train": optax.adamw(1e-3), "frozen": optax.set_to_zero()},
        {"dense": {"kernel": "train", "bias": "frozen"}},
    )
    opt_state = tx.init(params)
    w.save_last(str(tmp_path), 4, params, opt_state, 17, 0.25)
    w.close()

    raw = read_checkpoint_auto(os.path.join(str(tmp_path), "epoch_4.orbax"))
    restored = serialization.from_state_dict(opt_state, raw["optimizer"])
    _assert_tree_equal(restored, opt_state)
    assert int(raw["iter_num"]) == 17


def test_async_save_failure_raises_on_wait(tmp_path):
    """A background save failure surfaces from wait()/close()."""
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file in the way")
    w = CheckpointWriter(backend="msgpack", async_=True)
    w.save_best(str(blocker / "sub"), _params(), epoch=1, best_score=0.1)
    with pytest.raises(OSError):
        w.wait()
    w.close()  # error already consumed; close is clean


def test_writer_rejects_unknown_backend():
    with pytest.raises(ValueError):
        CheckpointWriter(backend="pickle")


def test_trainer_orbax_async_end_to_end(tmp_path):
    """trainer with TPU.CKPT_BACKEND=orbax + CKPT_ASYNC: best/last are
    orbax dirs, test.py evaluates from them, and --resume restores the
    full optimizer state from the orbax epoch checkpoint."""
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

    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, img_size=32, n_fake_train=6,
                               n_real_train=4)
    out1 = str(tmp_path / "run")
    c = default_config()
    c.defrost()
    c.DATA.DATA_PATH = root
    c.DATA.IMG_SIZE = 32
    c.DATA.NUM_WORKERS = 2
    c.LIST_DIR = os.path.join(root, "lists")
    c.TRAIN.MAX_EPOCHS = 2
    c.TRAIN.WARMUP_EPOCHS = 1
    c.TRAIN.BASE_LR = 1e-4
    c.MODEL.FREEZE_ENCODER = False
    c.MODEL.SWIN.EMBED_DIM = 16
    c.MODEL.SWIN.DEPTHS = (1, 1, 1, 1)
    c.MODEL.SWIN.DECODER_DEPTHS = (1, 1, 1, 1)
    c.MODEL.SWIN.NUM_HEADS = (2, 2, 2, 2)
    c.MODEL.SWIN.WINDOW_SIZE = 4
    c.SAVE_BEST_RUN = True
    c.SAVE_LAST_RUN = True
    c.SHOW_PREDICTIONS = 1
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.CKPT_BACKEND = "orbax"
    c.TPU.CKPT_ASYNC = True
    c.OUTPUT_DIR = out1
    c.freeze()

    def model():
        return MSUNet.from_config(c)

    assert trainer(model(), logging.getLogger("ob1"), None, out1,
                   c) == "Training Finished!"
    best = os.path.join(out1, "best_model.orbax")
    last = os.path.join(out1, "epoch_1.orbax")
    assert os.path.isdir(best) and os.path.isdir(last)
    assert not os.path.exists(os.path.join(out1, "best_model.msgpack"))

    # eval CLI loads the orbax best checkpoint from the run dir
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"DATA:\n  DATA_PATH: {root}\n  IMG_SIZE: 32\n  NUM_WORKERS: 2\n"
            f"LIST_DIR: {os.path.join(root, 'lists')}\n"
            "MODEL:\n  SWIN:\n    EMBED_DIM: 16\n"
            "    DEPTHS: [1, 1, 1, 1]\n    DECODER_DEPTHS: [1, 1, 1, 1]\n"
            "    NUM_HEADS: [2, 2, 2, 2]\n    WINDOW_SIZE: 4\n"
            "TPU:\n  COMPUTE_DTYPE: float32\n"
        )
    eval_dir = str(tmp_path / "eval")
    test_cli.main(["--cfg", cfg_path, "--check_point_dir", out1,
                   "--out_dir", eval_dir])
    assert os.path.isdir(os.path.join(eval_dir, "predictions"))

    # resume from the orbax epoch checkpoint: full state, no fallback
    out2 = str(tmp_path / "resumed")
    c2 = c.clone()
    c2.defrost()
    c2.OUTPUT_DIR = out2
    c2.TRAIN.MAX_EPOCHS = 3
    c2.freeze()
    log = logging.getLogger("ob2")
    log.setLevel(logging.INFO)
    records = []

    class Grab(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    log.addHandler(Grab())
    assert trainer(model(), log, None, out2, c2,
                   resume_from=last) == "Training Finished!"
    assert any("Resumed from" in m for m in records)
    assert not any("params only" in m for m in records)
    with open(os.path.join(out2, "val_metric_all_epoch.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[1][0] == "3"  # resumed at epoch 2 (0-indexed) -> logs 3
