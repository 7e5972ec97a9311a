"""Fused full-head kernel (GELU+d2s+conv+GELU+conv+LN) vs composed ops.

Interpret-mode equality of ``ops/fused_refine_head.py`` against the
composed XLA path it replaces (reference ``model_parts.py:437-476``):
op level (forward + all seven gradients), module level (same params
through ``FinalPatchExpandX4V2`` on both paths), and the per-shard
``shard_map`` variant on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_refine_head as frh,
    patch_ops,
)


@pytest.fixture(autouse=True)
def _interpret():
    frh.INTERPRET = True
    yield
    frh.INTERPRET = False


def _composed(y, w1, b1, w2, b2, g, be):
    a = jax.nn.gelu(y, approximate=True)
    x = patch_ops.depth_to_space(a, 4)
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=dn) + b1
    h = jax.nn.gelu(h, approximate=True)
    o = jax.lax.conv_general_dilated(
        h, w2, (1, 1), "SAME", dimension_numbers=dn) + b2
    mu = jnp.mean(o, -1, keepdims=True)
    va = jnp.mean(o * o, -1, keepdims=True) - mu * mu
    return (o - mu) * jax.lax.rsqrt(va + frh.LN_EPS) * g + be


def _inputs(b=2, ht=8, wt=8, c=128, seed=0):
    rng = np.random.RandomState(seed)
    y = jnp.asarray(rng.randn(b, ht, wt, 16 * c).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05
    b2 = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1
    g = jnp.asarray(1 + 0.1 * rng.randn(c).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    return y, w1, b1, w2, b2, g, be


def test_forward_matches_composed():
    args = _inputs()
    out_k = frh.fused_refine_head(*args)
    out_r = _composed(*args)
    assert out_k.shape == (2, 32, 32, 128)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5)


def test_forward_single_tile_and_odd_batch():
    # ht == tr (one tile: both halo masks active in the same program)
    args = _inputs(b=3, ht=4, wt=8)
    np.testing.assert_allclose(np.asarray(frh.fused_refine_head(*args)),
                               np.asarray(_composed(*args)), atol=2e-5)


def test_gradients_match_composed():
    args = _inputs(seed=1)
    rng = np.random.RandomState(9)
    r = jnp.asarray(rng.randn(2, 32, 32, 128).astype(np.float32))

    def lk(*a):
        return jnp.sum(frh.fused_refine_head(*a) * r)

    def lr(*a):
        return jnp.sum(_composed(*a) * r)

    gk = jax.grad(lk, argnums=tuple(range(7)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_module_fused_equals_unfused():
    """FinalPatchExpandX4V2: identical params, fused vs composed path."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
        FinalPatchExpandX4V2,
    )

    fused = FinalPatchExpandX4V2(dim=128, gelu_tanh=True, fused_head=True)
    plain = FinalPatchExpandX4V2(dim=128, gelu_tanh=True, fused_head=False)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    params = fused.init({"params": jax.random.PRNGKey(0)}, x)
    assert set(params["params"].keys()) == {
        "expand", "refine1", "refine2", "norm"}
    out_f = fused.apply(params, x)
    out_p = plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-5)


def test_sharded_matches_unsharded():
    """shard_map over the data axis == single-program, fwd and grads."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.parallel import (
        make_mesh,
    )

    mesh = make_mesh()
    args = _inputs(b=8, ht=4, wt=8, seed=2)
    out_s = frh.fused_refine_head_sharded(*args, mesh)
    out_u = frh.fused_refine_head(*args)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-6)

    rng = np.random.RandomState(11)
    r = jnp.asarray(rng.randn(*out_u.shape).astype(np.float32))

    def ls(*a):
        return jnp.sum(frh.fused_refine_head_sharded(*a, mesh) * r)

    def lu(*a):
        return jnp.sum(frh.fused_refine_head(*a) * r)

    gs = jax.grad(ls, argnums=tuple(range(7)))(*args)
    gu = jax.grad(lu, argnums=tuple(range(7)))(*args)
    for a, b in zip(gs, gu):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * scale)


def test_supported_gates():
    assert frh.supported((8, 128, 128, 2048), True)      # 512²
    assert not frh.supported((8, 128, 128, 2048), False)  # erf mode
    assert not frh.supported((8, 64, 64, 256), True)      # C != 128
    # 1024²: the saved-residual backward's smaller scratches fit tr=2
    assert frh.supported((2, 256, 256, 2048), True)
    assert not frh.supported((2, 249, 249, 2048), True)   # W%8 != 0
