"""Gradient accumulation + golden numeric regression."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
    default_config,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
    create_train_state,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
    make_train_step,
)


def _setup():
    # drop_path_rate=0 so the accumulation comparison is noise-free
    model = MSUNet(img_size=32, embed_dim=16, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4,
                   drop_path_rate=0.0)
    c = default_config(); c.defrost(); c.DATA.IMG_SIZE = 32
    state = create_train_state(model, c, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3), np.uint8))
    lbl = jnp.asarray((rng.rand(4, 32, 32) > 0.8).astype(np.uint8))
    return model, state, img, lbl


def test_accumulation_matches_full_batch():
    """Averaged micro-batch grads == full-batch grads (equal-size micros
    under the per-sample-mean DynamicLoss).  Compared at the gradient
    level: Adam's normalization would amplify epsilon-level differences
    into lr-sized sign flips, making post-update params ill-conditioned
    for comparison."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.losses import (
        dynamic_loss,
    )
    model, state, img, lbl = _setup()
    imgs = img.astype(jnp.float32) / 255.0
    lbls = lbl.astype(jnp.float32)

    def loss_of(params, im, lb):
        logits = model.apply({"params": params}, im, True)
        return dynamic_loss(logits, lb, 0.2, 0.8, 0.45)

    g_full = jax.grad(loss_of)(state.params, imgs, lbls)
    g_a = jax.grad(loss_of)(state.params, imgs[:2], lbls[:2])
    g_b = jax.grad(loss_of)(state.params, imgs[2:], lbls[2:])
    g_accum = jax.tree.map(lambda a, b: (a + b) / 2.0, g_a, g_b)
    for x, y in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_accum)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=1e-6)

    # the jitted accumulation path produces the same loss as full batch
    step1 = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    step2 = make_train_step(model, 0.2, 0.8, 0.45, donate=False,
                            accumulation_steps=2)
    _, loss1 = step1(state, img, lbl, jnp.asarray(1e-3))
    _, loss2 = step2(state, img, lbl, jnp.asarray(1e-3))
    assert abs(float(loss1) - float(loss2)) < 1e-5


def test_accumulation_indivisible_raises():
    model, state, img, lbl = _setup()
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False,
                           accumulation_steps=3)
    try:
        step(state, img, lbl, jnp.asarray(1e-3))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "divisible" in str(e)


def test_golden_forward_regression():
    """Fixed-seed model output fingerprint — catches silent numeric drift.

    If an intentional change alters numerics, re-record GOLDEN below and
    justify it in the commit message.
    """
    model = MSUNet(img_size=32, embed_dim=16, depths=(1, 1, 1, 1),
                   num_heads=(2, 2, 2, 2), window_size=4)
    x = jnp.asarray(
        (np.linspace(0, 1, 32 * 32 * 3, dtype=np.float32)
         ).reshape(1, 32, 32, 3)
    )
    params = model.init({"params": jax.random.PRNGKey(42)}, x, True)
    out = model.apply(params, x, True)
    fingerprint = [
        float(jnp.mean(out)),
        float(jnp.std(out)),
        float(out[0, 0, 0, 0]),
        float(out[0, 16, 16, 0]),
    ]
    GOLDEN = [-0.0210423246, 0.5595357418, -0.4499478936, -0.0232212692]
    np.testing.assert_allclose(fingerprint, GOLDEN, rtol=2e-4, atol=2e-5)
