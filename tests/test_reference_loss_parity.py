"""Parity vs the ACTUAL reference loss code (not a hand-mirrored oracle).

Imports ``/root/reference/loss/DynamicLoss.py`` and ``TverskyLoss.py``
(read-only, torch-CPU) via importlib and asserts our fused XLA losses
reproduce them bit-for-bit (fp32 tolerance) on randomized batches,
including the empty-mask branch (``DynamicLoss.py:100-106``) and uint8
{0,255} targets (``DynamicLoss.py:87-89``, ``TverskyLoss.py:27-29``).

Skips cleanly when the reference tree is not mounted.
"""

import importlib.util
import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from semantic_segmentation_of_stylegan2_artifacts_tpu.losses import (
    dynamic_loss,
    focal_tversky_loss,
    tversky_loss,
)

REF_LOSS_DIR = "/root/reference/loss"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_LOSS_DIR), reason="reference tree not mounted"
)


def _load(name):
    path = os.path.join(REF_LOSS_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location("ref_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_dynamic():
    return _load("DynamicLoss")


@pytest.fixture(scope="module")
def ref_tversky():
    return _load("TverskyLoss")


def _batch(seed, b=5, h=12, w=12, empty=(1, 3)):
    rng = np.random.RandomState(seed)
    logits = (rng.randn(b, h, w) * 3).astype(np.float32)
    targets = (rng.rand(b, h, w) > 0.6).astype(np.float32)
    for i in empty:
        targets[i] = 0.0
    return logits, targets


@pytest.mark.parametrize("mix", [0.0, 0.45, 1.0])
@pytest.mark.parametrize("alpha,beta", [(0.2, 0.8), (0.4, 0.6)])
def test_dynamic_loss_vs_reference_code(ref_dynamic, mix, alpha, beta):
    logits, targets = _batch(seed=int(mix * 100) + 1)
    ref = ref_dynamic.DynamicLoss(alpha=alpha, beta=beta, tversky_bce_mix=mix)
    # reference trainer feeds NCHW (B,1,H,W) logits and (B,H,W) targets
    want = float(ref(torch.tensor(logits).unsqueeze(1), torch.tensor(targets)))
    got = float(dynamic_loss(jnp.asarray(logits), jnp.asarray(targets),
                             alpha, beta, mix))
    assert abs(got - want) < 1e-6


def test_dynamic_loss_vs_reference_uint8_targets(ref_dynamic):
    logits, targets01 = _batch(seed=11)
    targets255 = (targets01 * 255).astype(np.uint8)
    ref = ref_dynamic.DynamicLoss(alpha=0.2, beta=0.8, tversky_bce_mix=0.45)
    want = float(ref(torch.tensor(logits).unsqueeze(1),
                     torch.tensor(targets255)))
    got = float(dynamic_loss(jnp.asarray(logits),
                             jnp.asarray(targets255), 0.2, 0.8, 0.45))
    assert abs(got - want) < 1e-6


def test_dynamic_loss_vs_reference_all_empty(ref_dynamic):
    logits, _ = _batch(seed=12)
    targets = np.zeros_like(logits)
    ref = ref_dynamic.DynamicLoss(alpha=0.2, beta=0.8, tversky_bce_mix=0.45)
    want = float(ref(torch.tensor(logits).unsqueeze(1), torch.tensor(targets)))
    got = float(dynamic_loss(jnp.asarray(logits), jnp.asarray(targets),
                             0.2, 0.8, 0.45))
    assert abs(got - want) < 1e-6


def test_per_sample_tversky_vs_reference_inner(ref_dynamic):
    """The TverskyLoss used INSIDE DynamicLoss (per-sample, DynamicLoss.py:22-52)."""
    logits, targets = _batch(seed=13, empty=())
    ref = ref_dynamic.TverskyLoss(alpha=0.3, beta=0.7)
    for i in range(logits.shape[0]):
        want = float(ref(torch.tensor(logits[i]).unsqueeze(0),
                         torch.tensor(targets[i]).unsqueeze(0)))
        got = float(tversky_loss(jnp.asarray(logits[i]),
                                 jnp.asarray(targets[i]), 0.3, 0.7))
        assert abs(got - want) < 1e-6


@pytest.mark.parametrize("as_255", [False, True])
def test_batch_tversky_vs_reference_binary(ref_tversky, as_255):
    """TverskyLoss_binary: per-sample TI over flattened pixels, batch mean."""
    logits, targets = _batch(seed=14)
    t_feed = (targets * 255).astype(np.float32) if as_255 else targets
    ref = ref_tversky.TverskyLoss_binary(alpha=0.4, beta=0.6)
    want = float(ref(torch.tensor(logits).unsqueeze(1), torch.tensor(t_feed)))
    got = float(jnp.mean(tversky_loss(
        jnp.asarray(logits).reshape(logits.shape[0], -1),
        jnp.asarray(targets).reshape(targets.shape[0], -1),
        0.4, 0.6, axis=1)))
    assert abs(got - want) < 1e-6


def test_focal_tversky_vs_reference(ref_dynamic):
    """FocalTverskyLoss: GLOBAL sums (not per-sample), DynamicLoss.py:54-70."""
    logits, targets = _batch(seed=15, empty=())
    ref = ref_dynamic.FocalTverskyLoss(alpha=0.4, beta=0.6, gamma=1.1)
    want = float(ref(torch.tensor(logits), torch.tensor(targets)))
    got = float(focal_tversky_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   0.4, 0.6, gamma=1.1))
    assert abs(got - want) < 1e-6
