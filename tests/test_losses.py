"""Loss parity tests vs torch (independent oracle) and hand-computed values."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from semantic_segmentation_of_stylegan2_artifacts_tpu.losses import (
    DynamicLoss,
    bce_with_logits,
    dynamic_loss,
    focal_tversky_loss,
    symmetric_unified_focal_loss,
    tversky_loss,
)


def torch_dynamic_loss(logits, targets, alpha, beta, mix):
    """Per-sample loop oracle with torch ops (mirrors the reference
    semantics: BCE always; add Tversky when the sample mask is non-empty).
    """
    lo = torch.tensor(logits)
    ta = torch.tensor(targets).float()
    if ta.max() > 1:
        ta = (ta > 127.5).float()
    losses = []
    for i in range(lo.shape[0]):
        x, y = lo[i], ta[i]
        bce = torch.nn.functional.binary_cross_entropy_with_logits(x, y)
        if y.sum() != 0:
            p = torch.sigmoid(x)
            tp = (p * y).sum()
            fp = (p * (1 - y)).sum()
            fn = ((1 - p) * y).sum()
            ti = (tp + 1e-6) / (tp + alpha * fp + beta * fn + 1e-6)
            losses.append((1 - mix) * bce + mix * (1 - ti))
        else:
            losses.append(bce)
    return float(torch.stack(losses).mean())


def test_bce_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 16, 16).astype(np.float32) * 3
    y = (rng.rand(4, 16, 16) > 0.7).astype(np.float32)
    want = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(y)))
    got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) < 1e-6


@pytest.mark.parametrize("mix", [0.0, 0.45, 1.0])
def test_dynamic_loss_matches_oracle(mix):
    rng = np.random.RandomState(1)
    x = rng.randn(4, 8, 8).astype(np.float32)
    y = (rng.rand(4, 8, 8) > 0.6).astype(np.float32)
    y[1] = 0.0  # one empty-mask (real) sample
    y[3] = 0.0
    want = torch_dynamic_loss(x, y, 0.2, 0.8, mix)
    got = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y), 0.2, 0.8, mix))
    assert abs(got - want) < 1e-6


def test_dynamic_loss_all_empty_equals_bce():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8).astype(np.float32)
    y = np.zeros((2, 8, 8), np.float32)
    got = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y), 0.2, 0.8, 0.45))
    want = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) < 1e-6


def test_dynamic_loss_uint8_targets():
    """targets in {0,255} are normalized via >127.5 (reference contract)."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8).astype(np.float32)
    y01 = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    y255 = y01 * 255.0
    a = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y01)))
    b = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y255)))
    assert abs(a - b) < 1e-6


def test_dynamic_loss_channel_dim_accepted():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 1).astype(np.float32)
    y = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    a = float(dynamic_loss(jnp.asarray(x), jnp.asarray(y)))
    b = float(dynamic_loss(jnp.asarray(x[..., 0]), jnp.asarray(y[..., 0])))
    assert abs(a - b) < 1e-6


def test_tversky_perfect_prediction_near_zero():
    y = np.zeros((8, 8), np.float32)
    y[2:5, 2:5] = 1.0
    big = jnp.asarray(np.where(y > 0, 40.0, -40.0).astype(np.float32))
    loss = float(tversky_loss(big, jnp.asarray(y), 0.3, 0.7))
    assert loss < 1e-5


def test_focal_tversky_gamma_powers():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    y = jnp.asarray((rng.rand(8, 8) > 0.5).astype(np.float32))
    base = float(tversky_loss(x, y, 0.4, 0.6))
    focal = float(focal_tversky_loss(x, y, 0.4, 0.6, gamma=2.0))
    assert abs(focal - base**2) < 1e-6


def test_unified_focal_loss_finite_and_ordered():
    rng = np.random.RandomState(6)
    y = (rng.rand(2, 16, 16) > 0.7).astype(np.float32)
    good = jnp.asarray(np.where(y > 0, 8.0, -8.0).astype(np.float32))
    bad = jnp.asarray(np.where(y > 0, -8.0, 8.0).astype(np.float32))
    lg = float(symmetric_unified_focal_loss(good, jnp.asarray(y)))
    lb = float(symmetric_unified_focal_loss(bad, jnp.asarray(y)))
    assert np.isfinite(lg) and np.isfinite(lb)
    assert lg < lb


def test_dynamic_loss_class_from_config():
    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    c = default_config()
    c.TRAIN.TVERSKY_LOSS_ALPHA = 0.2
    c.TRAIN.TVERSKY_LOSS_BETA = 0.8
    c.TRAIN.LOSS_TVERSKY_BCE_MIX = 0.45
    dl = DynamicLoss.from_config(c)
    rng = np.random.RandomState(7)
    x = rng.randn(2, 8, 8).astype(np.float32)
    y = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    want = torch_dynamic_loss(x, y, 0.2, 0.8, 0.45)
    assert abs(float(dl(jnp.asarray(x), jnp.asarray(y))) - want) < 1e-6
