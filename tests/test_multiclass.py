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
