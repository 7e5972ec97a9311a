"""Fused Pallas MLP-sublayer kernel vs the XLA path.

Runs the kernel in the Pallas interpreter on CPU and asserts forward and
VJP parity against the functional composition the XLA path executes
(``models/layers.py``: ``apply_layer_norm`` + ``Mlp``), including token
counts that don't divide the tile, both GELU variants, the grid-wide
weight-gradient accumulation, and the shard_map data-parallel wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
    SwinBlock,
    apply_layer_norm,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_mlp as fm,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fm, "INTERPRET", True)


def _make_inputs(key, lead, c, hidden, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    mk = lambda k, shape, s: (jax.random.normal(k, shape) * s).astype(  # noqa: E731
        jnp.float32)
    return dict(
        x=(jax.random.normal(ks[0], lead + (c,)) * 0.5).astype(dtype),
        ln_scale=1.0 + mk(ks[1], (c,), 0.1),
        ln_bias=mk(ks[2], (c,), 0.1),
        fc1_kernel=mk(ks[3], (c, hidden), 0.05),
        fc1_bias=mk(ks[4], (hidden,), 0.1),
        fc2_kernel=mk(ks[5], (hidden, c), 0.05),
        fc2_bias=mk(ks[6], (c,), 0.1),
    )


def _xla_branch(x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
                fc2_bias, *, gelu_tanh):
    """The exact op sequence of the model's XLA fallback path."""
    dt = x.dtype
    n = apply_layer_norm(x, ln_scale, ln_bias, dt)
    nd = n.ndim - 1
    z = jax.lax.dot_general(
        n, fc1_kernel.astype(dt), (((nd,), (0,)), ((), ()))
    ) + fc1_bias.astype(dt)
    h = jax.nn.gelu(z, approximate=gelu_tanh)
    return jax.lax.dot_general(
        h, fc2_kernel.astype(dt), (((nd,), (0,)), ((), ()))
    ) + fc2_bias.astype(dt)


CASES = [
    # (leading shape, C, hidden, gelu_tanh)
    ((2, 8, 8), 128, 512, False),       # spatial map, exact GELU
    ((2, 8, 8), 128, 512, True),        # tanh GELU
    ((100,), 128, 512, False),          # T=100: tile padding
    ((3, 7), 256, 1024, True),          # T=21 < one tile
    ((1, 600), 128, 512, True),         # multi-tile with remainder
]


@pytest.mark.parametrize("lead,c,hidden,tanh", CASES)
def test_forward_matches_xla_path(lead, c, hidden, tanh):
    inp = _make_inputs(jax.random.PRNGKey(0), lead, c, hidden)
    want = _xla_branch(**inp, gelu_tanh=tanh)
    got = fm.fused_mlp(**inp, gelu_tanh=tanh)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("lead,c,hidden,tanh", CASES[:3])
def test_vjp_matches_xla_path(lead, c, hidden, tanh):
    inp = _make_inputs(jax.random.PRNGKey(1), lead, c, hidden)
    keys = list(inp)

    def loss_fused(*args):
        out = fm.fused_mlp(**dict(zip(keys, args)), gelu_tanh=tanh)
        return jnp.sum(out * out)

    def loss_xla(*args):
        out = _xla_branch(**dict(zip(keys, args)), gelu_tanh=tanh)
        return jnp.sum(out * out)

    args = tuple(inp.values())
    argnums = tuple(range(len(args)))
    got = jax.grad(loss_fused, argnums)(*args)
    want = jax.grad(loss_xla, argnums)(*args)
    for key, g, w in zip(keys, got, want):
        assert g.shape == w.shape and g.dtype == w.dtype, key
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"d{key}")


def test_bfloat16_forward_close():
    inp = _make_inputs(jax.random.PRNGKey(2), (2, 8, 8), 128, 512,
                       dtype=jnp.bfloat16)
    want = _xla_branch(**inp, gelu_tanh=True)
    got = fm.fused_mlp(**inp, gelu_tanh=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_supported_gating():
    assert fm.supported((4, 8, 8, 128), 512)
    assert not fm.supported((4, 8, 8, 96), 384)       # lane alignment
    assert not fm.supported((4, 8, 8, 1024), 4096)    # dim cap
    assert not fm.supported(
        (4, 8, 8, 128), 512, dropout=0.1, deterministic=False)
    assert fm.supported(
        (4, 8, 8, 128), 512, dropout=0.1, deterministic=True)


def test_shard_map_matches_unsharded():
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    inp = _make_inputs(jax.random.PRNGKey(3), (4, 8, 8), 128, 512)
    want = fm.fused_mlp(**inp, gelu_tanh=True)
    got = fm.fused_mlp(**inp, gelu_tanh=True, data_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def loss_fn(mesh_arg):
        def f(x):
            out = fm.fused_mlp(
                x, inp["ln_scale"], inp["ln_bias"], inp["fc1_kernel"],
                inp["fc1_bias"], inp["fc2_kernel"], inp["fc2_bias"],
                gelu_tanh=True, data_mesh=mesh_arg)
            return jnp.sum(out * out)
        return jax.grad(f)(inp["x"])

    np.testing.assert_allclose(
        np.asarray(loss_fn(mesh)), np.asarray(loss_fn(None)),
        atol=5e-4, rtol=5e-4)


def test_swin_block_fused_equals_xla():
    """Model-level routing: fused and XLA MLP paths agree, same params."""
    x = (jax.random.normal(jax.random.PRNGKey(4), (2, 10, 12, 128)) * 0.5)
    kw = dict(dim=128, num_heads=4, window_size=7, shift=True)
    blk_x = SwinBlock(use_fused_mlp=False, **kw)
    blk_f = SwinBlock(use_fused_mlp=True, **kw)
    params = jax.jit(blk_x.init)(jax.random.PRNGKey(0), x)
    params_f = jax.jit(blk_f.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(params_f))
    want = blk_x.apply(params, x)
    got = blk_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
