"""Training layer tests: schedule semantics, optimizer masks, e2e loop."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
    default_config,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
    CosineWarmupSchedule,
    create_train_state,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.optim import (
    build_optimizer,
    decay_mask_fn,
    freeze_labels,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
    make_eval_step,
    make_train_step,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.checkpoint import (
    load_best,
    restore_checkpoint,
    save_best,
    save_checkpoint,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)


# ---------------------------------------------------------------------------
# Schedule: exact timm CosineLRScheduler semantics
# ---------------------------------------------------------------------------
def test_schedule_reference_settings():
    """60 epochs, 20 warmup, base 1e-5, warmup 1e-6, min 1e-6, prefix."""
    c = default_config()
    c.defrost()
    c.TRAIN.MAX_EPOCHS = 60
    c.TRAIN.WARMUP_EPOCHS = 20
    c.TRAIN.BASE_LR = 1e-5
    c.TRAIN.WARMUP_LR = 1e-6
    c.TRAIN.MIN_LR = 1e-6
    s = CosineWarmupSchedule.from_config(c)
    assert s.t_initial == 40
    # warmup: epoch 0 at warmup_lr, linear to base at epoch 20
    assert abs(s.lr_at_epoch(0) - 1e-6) < 1e-15
    expect_e10 = 1e-6 + 10 * (1e-5 - 1e-6) / 20
    assert abs(s.lr_at_epoch(10) - expect_e10) < 1e-15
    assert abs(s.lr_at_epoch(20) - 1e-5) < 1e-15  # cos(0) peak
    # midpoint of cosine: t=40 -> tt=20/40 -> lr = min + 0.5*(base-min)
    assert abs(s.lr_at_epoch(40) - (1e-6 + 0.5 * (1e-5 - 1e-6))) < 1e-15
    # end of cycle
    assert abs(s.lr_at_epoch(60) - 1e-6) < 1e-15
    assert abs(s.lr_at_epoch(75) - 1e-6) < 1e-15  # beyond cycle -> min
    # monotone decreasing after warmup
    lrs = [s.lr_at_epoch(e) for e in range(20, 61)]
    assert all(a >= b - 1e-18 for a, b in zip(lrs, lrs[1:]))


def test_schedule_max60_quirk():
    """MAX_EPOCHS < 60 still uses t_initial = 60 - warmup (trainer.py:155)."""
    c = default_config()
    c.defrost()
    c.TRAIN.MAX_EPOCHS = 30
    c.TRAIN.WARMUP_EPOCHS = 10
    s = CosineWarmupSchedule.from_config(c)
    assert s.t_initial == 50


# ---------------------------------------------------------------------------
# Optimizer masks
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_state():
    model = MSUNet(img_size=32, embed_dim=16, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4)
    c = default_config()
    c.defrost()
    c.DATA.IMG_SIZE = 32
    state = create_train_state(
        model, c, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    return model, c, state


def test_decay_mask_rules(tiny_state):
    _, _, state = tiny_state
    from flax import traverse_util
    mask = traverse_util.flatten_dict(decay_mask_fn(state.params))
    params = traverse_util.flatten_dict(state.params)
    for k, m in mask.items():
        path = "/".join(k).lower()
        if params[k].ndim == 1:
            assert not m, f"1-d param decayed: {path}"
        if "norm" in path:
            assert not m, f"norm param decayed: {path}"
    # a dense kernel must decay
    decayed = [k for k, m in mask.items() if m]
    assert any("qkv" in "/".join(k) for k in decayed)
    # relative position bias table is 2-d, no 'norm': decays (ref behavior)
    assert any("relative_position_bias_table" in "/".join(k) for k in decayed)


def test_freeze_labels_encoder_only(tiny_state):
    _, _, state = tiny_state
    from flax import traverse_util
    labels = traverse_util.flatten_dict(
        freeze_labels(state.params, {0, 1, 2, 3}, True)
    )
    for k, v in labels.items():
        path = "/".join(k)
        if "patch_embed" in path or ("/layers_" in "/" + path and
                                     "layers_up" not in path and
                                     "layers_cent" not in path):
            assert v == "frozen", path
        else:
            assert v == "trainable", path


def test_frozen_params_do_not_move(tiny_state):
    model, c, state = tiny_state
    tx = build_optimizer(c, state.params, {0, 1, 2, 3}, True)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    img = np.random.RandomState(0).randint(0, 255, (2, 32, 32, 3), np.uint8)
    lbl = (np.random.RandomState(1).rand(2, 32, 32) > 0.8).astype(np.uint8)
    new_state, loss = step(state, jnp.asarray(img), jnp.asarray(lbl),
                           jnp.asarray(1e-3))
    from flax import traverse_util
    old = traverse_util.flatten_dict(state.params)
    new = traverse_util.flatten_dict(new_state.params)
    enc_moved = dec_moved = 0
    for k in old:
        path = "/".join(k)
        changed = not np.allclose(np.asarray(old[k]), np.asarray(new[k]))
        in_enc = ("patch_embed" in path) or (
            path.split("/")[1].startswith("layers_")
            and not path.split("/")[1].startswith(("layers_up", "layers_cent"))
        )
        if in_enc:
            assert not changed, f"frozen param moved: {path}"
            enc_moved += changed
        else:
            dec_moved += changed
    assert dec_moved > 0
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# Train step: loss decreases on a tiny overfit problem
# ---------------------------------------------------------------------------
def test_train_step_loss_decreases(tiny_state):
    model, c, state = tiny_state
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    lbl = np.zeros((2, 32, 32), np.uint8)
    lbl[:, 8:16, 8:16] = 1
    img_j, lbl_j = jnp.asarray(img), jnp.asarray(lbl)
    lr = jnp.asarray(3e-4)
    losses = []
    for _ in range(12):
        state, loss = step(state, img_j, lbl_j, lr)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
    assert all(np.isfinite(l) for l in losses)


def test_eval_step_shapes(tiny_state):
    model, c, state = tiny_state
    ev = make_eval_step(model, 0.2, 0.8, 0.45)
    img = np.zeros((1, 32, 32, 3), np.uint8)
    lbl = np.zeros((1, 32, 32), np.uint8)
    probs, loss = ev(state.params, jnp.asarray(img), jnp.asarray(lbl))
    assert probs.shape == (1, 32, 32)
    assert probs.dtype == jnp.float32
    assert 0.0 <= float(probs.min()) and float(probs.max()) <= 1.0


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------
def test_checkpoint_roundtrip(tiny_state, tmp_path):
    _, _, state = tiny_state
    path = save_best(str(tmp_path), state.params, epoch=5, best_score=0.71)
    out = load_best(str(tmp_path), params_target=state.params)
    assert out["epoch"] == 5
    assert abs(out["best_score"] - 0.71) < 1e-9
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(out["model"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_atomic_write(tmp_path):
    p = str(tmp_path / "x.msgpack")
    save_checkpoint(p, {"a": jnp.ones((3,))})
    assert os.path.exists(p)
    assert not os.path.exists(p + ".tmp")
    got = restore_checkpoint(p)
    np.testing.assert_array_equal(got["a"], np.ones((3,)))


# ---------------------------------------------------------------------------
# End-to-end tiny training (the reference "two.txt" smoke pattern)
# ---------------------------------------------------------------------------
def test_trainer_end_to_end(tmp_path):
    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, img_size=32)
    c = default_config()
    c.defrost()
    c.DATA.DATA_PATH = root
    c.DATA.IMG_SIZE = 32
    c.LIST_DIR = os.path.join(root, "lists")
    c.TRAIN.MAX_EPOCHS = 2
    c.TRAIN.WARMUP_EPOCHS = 1
    c.TRAIN.BASE_LR = 1e-4
    c.MODEL.FREEZE_ENCODER = False
    c.SAVE_BEST_RUN = True
    c.SHOW_PREDICTIONS = 2
    c.DATA.NUM_WORKERS = 2
    c.TPU.COMPUTE_DTYPE = "float32"
    c.freeze()

    model = MSUNet(img_size=32, embed_dim=16, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4)
    out_dir = str(tmp_path / "out")
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.trainer import (
        trainer,
    )
    logger = logging.getLogger("test_trainer")
    result = trainer(model, logger, None, out_dir, c)
    assert result == "Training Finished!"
    # outputs: CSVs, best checkpoint, final predictions
    assert os.path.exists(os.path.join(out_dir, "val_metric_all_epoch.csv"))
    assert os.path.exists(os.path.join(out_dir, "best_model.msgpack"))
    import csv as _csv
    with open(os.path.join(out_dir, "val_metric_all_epoch.csv")) as f:
        rows = list(_csv.reader(f))
    assert len(rows) == 3  # header + 2 epochs
    assert rows[0][-1] == "Score"
    preds = os.listdir(os.path.join(out_dir, "final_preds"))
    assert any(p.endswith("_grey_heats.png") for p in preds)
    assert any(p.endswith("_bin_mask.png") for p in preds)


def test_orbax_checkpoint_roundtrip(tiny_state, tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    _, _, state = tiny_state
    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, state.params)
    restored = restore_checkpoint_orbax(path, target=state.params)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # overwrite works (pre-existing dir removed)
    save_checkpoint_orbax(path, state.params)


# ---------------------------------------------------------------------------
# Unfreeze rebuild preserves Adam moments (add_param_group semantics)
# ---------------------------------------------------------------------------
def _adam_moments(opt_state):
    """Locate the ScaleByAdamState (mu, nu, count) inside any wrapping."""
    import optax

    found = {}

    def scan(node):
        if isinstance(node, optax.ScaleByAdamState):
            found[id(node)] = node
            return
        if hasattr(node, "inner_states"):
            scan(node.inner_states["trainable"])
        elif hasattr(node, "inner_state"):
            scan(node.inner_state)
        elif isinstance(node, tuple) and not hasattr(node, "shape"):
            for item in node:
                scan(item)

    scan(opt_state)
    assert len(found) == 1, f"expected one adam state, got {len(found)}"
    return next(iter(found.values()))


def test_unfreeze_carries_adam_moments(tiny_state):
    import optax
    from flax import traverse_util

    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.optim import (
        carry_opt_state,
    )

    model, c, state = tiny_state
    tx = build_optimizer(c, state.params, {2, 3}, False)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    img = np.random.RandomState(2).randint(0, 255, (2, 32, 32, 3), np.uint8)
    lbl = (np.random.RandomState(3).rand(2, 32, 32) > 0.8).astype(np.uint8)
    for _ in range(2):
        state, _ = step(state, jnp.asarray(img), jnp.asarray(lbl),
                        jnp.asarray(1e-3))

    def flat_mu(opt_state):
        adam = _adam_moments(opt_state)
        return traverse_util.flatten_dict(adam.mu), adam

    old_mu, old_adam = flat_mu(state.opt_state)
    assert int(old_adam.count) == 2

    # ---- stage-3 unfreeze: {2,3} -> {2} --------------------------------
    tx2 = build_optimizer(c, state.params, {2}, False)
    carried = carry_opt_state(state.opt_state, tx2.init(state.params))
    new_mu, new_adam = flat_mu(carried)
    assert int(new_adam.count) == 2  # step count survives

    for k, v in new_mu.items():
        path = "/".join(k)
        top = k[1] if len(k) > 1 else ""
        if isinstance(v, optax.MaskedNode):
            assert top == "layers_2", f"unexpected masked leaf: {path}"
            continue
        if top == "layers_3":
            # newly unfrozen: fresh zero moments (was MaskedNode before)
            assert isinstance(old_mu[k], optax.MaskedNode)
            assert float(jnp.abs(v).max()) == 0.0, path
        elif not isinstance(old_mu[k], optax.MaskedNode):
            # long-trainable params: bit-identical moments
            assert np.array_equal(np.asarray(v), np.asarray(old_mu[k])), path

    # a decoder moment must actually be nonzero for the test to mean much
    nonzero = [k for k, v in new_mu.items()
               if not isinstance(v, optax.MaskedNode)
               and float(jnp.abs(v).max()) > 0]
    assert nonzero

    # ---- full unfreeze: {2} -> {} (wrapper disappears) ------------------
    state2 = state.replace(tx=tx2, opt_state=carried)
    state2, _ = step(state2, jnp.asarray(img), jnp.asarray(lbl),
                     jnp.asarray(1e-3))
    mid_mu, mid_adam = flat_mu(state2.opt_state)
    tx3 = build_optimizer(c, state2.params, set(), False)
    carried3 = carry_opt_state(state2.opt_state, tx3.init(state2.params))
    fin_mu, fin_adam = flat_mu(carried3)
    assert int(fin_adam.count) == int(mid_adam.count)
    for k, v in fin_mu.items():
        if not isinstance(mid_mu[k], optax.MaskedNode):
            assert np.array_equal(np.asarray(v), np.asarray(mid_mu[k]))
    # and the carried state still drives a working step
    state3 = state2.replace(tx=tx3, opt_state=carried3)
    _, loss = step(state3, jnp.asarray(img), jnp.asarray(lbl),
                   jnp.asarray(1e-3))
    assert np.isfinite(float(loss))


def test_set_learning_rate_behavioral_pin(tiny_state):
    """set_learning_rate reaches into optax internals (inject_hyperparams
    state, multi_transform inner_states) — this pins the BEHAVIOR so an
    optax upgrade that moves those internals fails loudly here: the lr
    passed to the train step must scale the actual applied update."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.optim import (
        current_learning_rate,
    )

    model, c, state = tiny_state
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    img = np.random.RandomState(20).randint(0, 255, (2, 32, 32, 3), np.uint8)
    lbl = (np.random.RandomState(21).rand(2, 32, 32) > 0.8).astype(np.uint8)

    def update_norm(lr):
        s2, _ = step(state, jnp.asarray(img), jnp.asarray(lbl),
                     jnp.asarray(lr, jnp.float32))
        deltas = jax.tree.map(lambda a, b: np.asarray(b - a), state.params,
                              s2.params)
        return float(np.sqrt(sum(float((d ** 2).sum())
                                 for d in jax.tree.leaves(deltas)))), s2

    n_small, _ = update_norm(1e-5)
    n_big, s_big = update_norm(1e-3)
    # Adam updates scale ~linearly with lr (same grads, same moments)
    assert n_big > n_small * 50, (n_big, n_small)
    # the injected lr is readable back from the state the step produced
    assert abs(current_learning_rate(s_big.opt_state) - 1e-3) < 1e-9

    # zero lr -> bit-identical params
    n_zero, _ = update_norm(0.0)
    assert n_zero == 0.0

    # and the multi_transform-wrapped variant behaves the same
    tx = build_optimizer(c, state.params, {3}, False)
    state_f = state.replace(tx=tx, opt_state=tx.init(state.params))
    s3, _ = step(state_f, jnp.asarray(img), jnp.asarray(lbl),
                 jnp.asarray(1e-3, jnp.float32))
    assert abs(current_learning_rate(s3.opt_state) - 1e-3) < 1e-9
