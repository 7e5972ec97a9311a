"""Pallas fused window-attention parity vs the XLA path (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import semantic_segmentation_of_stylegan2_artifacts_tpu.ops.pallas_attention as pa
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops.window_attention import (
    shifted_window_attention,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # the module refs pl.pallas_call at call time via the pl module
    yield


@pytest.mark.parametrize(
    "h,w0,win,shift,c,heads",
    [
        (14, 14, 7, 0, 16, 2),
        (14, 14, 7, 3, 16, 2),
        (9, 10, 4, 2, 8, 2),
        (6, 13, 7, 3, 8, 4),
        (16, 16, 4, 2, 32, 4),
    ],
)
def test_matches_xla_path(h, w0, win, shift, c, heads):
    rng = np.random.RandomState(h + w0 + win + shift + c)
    x = rng.randn(2, h, w0, c).astype(np.float32)
    qkv_k = (rng.randn(c, 3 * c) * 0.1).astype(np.float32)
    qkv_b = (rng.randn(3 * c) * 0.1).astype(np.float32)
    proj_k = (rng.randn(c, c) * 0.1).astype(np.float32)
    proj_b = (rng.randn(c) * 0.1).astype(np.float32)
    table = (rng.randn((2 * win - 1) ** 2, heads) * 0.1).astype(np.float32)

    want = shifted_window_attention(
        jnp.asarray(x), jnp.asarray(qkv_k), jnp.asarray(qkv_b),
        jnp.asarray(proj_k), jnp.asarray(proj_b), jnp.asarray(table),
        window_size=(win, win), shift_size=(shift, shift), num_heads=heads,
    )
    got = pa.pallas_shifted_window_attention(
        jnp.asarray(x), jnp.asarray(qkv_k), jnp.asarray(qkv_b),
        jnp.asarray(proj_k), jnp.asarray(proj_b), jnp.asarray(table),
        window_size=(win, win), shift_size=(shift, shift), num_heads=heads,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_xla_path():
    c, heads, win, shift = 8, 2, 4, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
    args = [
        jnp.asarray((rng.randn(c, 3 * c) * 0.1).astype(np.float32)),
        jnp.asarray((rng.randn(3 * c) * 0.1).astype(np.float32)),
        jnp.asarray((rng.randn(c, c) * 0.1).astype(np.float32)),
        jnp.asarray((rng.randn(c) * 0.1).astype(np.float32)),
        jnp.asarray((rng.randn((2 * win - 1) ** 2, heads) * 0.1
                     ).astype(np.float32)),
    ]

    def loss_pallas(x, *a):
        out = pa.pallas_shifted_window_attention(
            x, *a, window_size=(win, win), shift_size=(shift, shift),
            num_heads=heads)
        return jnp.sum(out**2)

    def loss_xla(x, *a):
        out = shifted_window_attention(
            x, *a, window_size=(win, win), shift_size=(shift, shift),
            num_heads=heads)
        return jnp.sum(out**2)

    gp = jax.grad(loss_pallas, argnums=tuple(range(6)))(x, *args)
    gx = jax.grad(loss_xla, argnums=tuple(range(6)))(x, *args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_flag_uses_pallas(monkeypatch):
    """MSUNet(use_pallas=True) routes attention through the fused op."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet

    calls = {"n": 0}
    orig = pa.pallas_shifted_window_attention

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pa, "pallas_shifted_window_attention", counting)

    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(1, 1, 1, 1), window_size=4, use_pallas=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    model.apply(params, x, True)
    assert calls["n"] > 0
