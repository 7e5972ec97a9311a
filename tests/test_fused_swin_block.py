"""Fused whole-Swin-block Pallas kernel vs the XLA block path.

Runs the kernel in the Pallas interpreter on CPU and asserts forward and
VJP parity against the plain ``SwinBlock`` (all per-op kernels off),
including shifted windows, padded grids, stochastic depth (same RNG
stream), gradient accumulation across the strip grid for every weight,
and the shard_map data-parallel wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
    SwinBlock,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_swin_block as fb,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fb, "INTERPRET", True)


def _pair(shift, hw=(8, 8), c=128, heads=4, window=4, tanh=False,
          drop_path=0.0):
    kw = dict(dim=c, num_heads=heads, window_size=window, shift=shift,
              gelu_tanh=tanh, stochastic_depth_prob=drop_path)
    blk_x = SwinBlock(use_fused_block=False, **kw)
    blk_f = SwinBlock(use_fused_block=True, **kw)
    x = (jax.random.normal(jax.random.PRNGKey(7), (2,) + hw + (c,)) * 0.5)
    params = jax.jit(blk_x.init)(jax.random.PRNGKey(0), x)
    return blk_x, blk_f, params, x


CASES = [
    # (shift, HW, C, heads, window, gelu_tanh)
    (False, (8, 8), 128, 4, 4, False),
    (True, (8, 8), 128, 4, 4, False),     # shifted: roll + region mask
    (True, (10, 10), 128, 4, 4, True),    # pad 10->12 + shift + tanh
    (False, (10, 6), 128, 4, 4, False),   # asymmetric pad
    (True, (8, 8), 256, 8, 4, True),      # two windows per score group
]


@pytest.mark.parametrize("shift,hw,c,heads,window,tanh", CASES)
def test_forward_matches_xla_block(shift, hw, c, heads, window, tanh):
    blk_x, blk_f, params, x = _pair(shift, hw, c, heads, window, tanh)
    want = blk_x.apply(params, x)
    got = blk_f.apply(params, x)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("shift,hw,c,heads,window,tanh", CASES[:3])
def test_vjp_matches_xla_block(shift, hw, c, heads, window, tanh):
    blk_x, blk_f, params, x = _pair(shift, hw, c, heads, window, tanh)

    def loss(blk):
        def f(p, xx):
            out = blk.apply(p, xx)
            return jnp.sum(out * out)
        return f

    gp_w, gx_w = jax.grad(loss(blk_x), (0, 1))(params, x)
    gp_g, gx_g = jax.grad(loss(blk_f), (0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gx_g), np.asarray(gx_w), atol=1e-3, rtol=1e-3,
        err_msg="dx")
    flat_w = jax.tree_util.tree_flatten_with_path(gp_w)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(gp_g)[0]
    assert len(flat_w) == len(flat_g)
    for (kw_, w), (kg_, g) in zip(flat_w, flat_g):
        assert kw_ == kg_
        name = jax.tree_util.keystr(kw_)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-3, rtol=2e-3,
            err_msg=f"d{name}")


def test_bfloat16_forward_close():
    blk_x, blk_f, params, x = _pair(True, (8, 8), 128, 4, 4, True)
    kw = dict(dim=128, num_heads=4, window_size=4, shift=True,
              gelu_tanh=True, dtype=jnp.bfloat16)
    blk_x = SwinBlock(use_fused_block=False, **kw)
    blk_f = SwinBlock(use_fused_block=True, **kw)
    want = blk_x.apply(params, x)
    got = blk_f.apply(params, x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_stochastic_depth_same_rng_stream():
    """Training mode: both paths draw the same per-sample drop decisions."""
    blk_x, blk_f, params, x = _pair(True, (8, 8), 128, 4, 4,
                                    drop_path=0.5)
    rngs = {"dropout": jax.random.PRNGKey(11)}
    want = blk_x.apply(params, x, False, rngs=rngs)
    got = blk_f.apply(params, x, False, rngs=rngs)
    # same Bernoulli draws => dropped samples match exactly; kept samples
    # agree to rounding (x*noise/keep vs x*(noise/keep))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    # and the factors genuinely vary across samples/draws
    many = blk_f.apply(
        params,
        jnp.tile(x, (8, 1, 1, 1)),
        False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    per_sample = np.asarray(many).reshape(16, -1)
    assert len({round(float(np.abs(r).sum()), 3) for r in per_sample}) > 1


def test_supported_gating():
    ok = dict(dropout=0.0, attention_dropout=0.0, deterministic=True)
    assert fb.supported((2, 8, 8, 128), (4, 4), 4, 512, **ok)
    assert not fb.supported((2, 8, 8, 1024), (4, 4), 32, 4096, **ok)  # cap
    assert not fb.supported((2, 8, 8, 120), (4, 4), 4, 512, **ok)
    assert not fb.supported((2, 8, 8, 128), (23, 23), 1, 512, **ok)  # n cap
    assert not fb.supported(
        (2, 8, 200, 128), (4, 4), 4, 512, **ok)  # wide strip
    assert not fb.supported(
        (2, 8, 8, 128), (4, 4), 4, 512,
        dropout=0.1, attention_dropout=0.0, deterministic=False)
    assert fb.supported(
        (2, 8, 8, 128), (4, 4), 4, 512,
        dropout=0.1, attention_dropout=0.0, deterministic=True)


def test_shard_map_matches_unsharded():
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    kw = dict(dim=128, num_heads=4, window_size=4, shift=True)
    blk_f = SwinBlock(use_fused_block=True, **kw)
    blk_m = SwinBlock(use_fused_block=True, data_mesh=mesh, **kw)
    x = (jax.random.normal(jax.random.PRNGKey(9), (4, 8, 8, 128)) * 0.5)
    params = jax.jit(blk_f.init)(jax.random.PRNGKey(0), x)
    want = blk_f.apply(params, x)
    got = blk_m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def gp(blk):
        def f(p):
            out = blk.apply(p, x)
            return jnp.sum(out * out)
        return jax.grad(f)(params)

    for (kw_, w), (_, g) in zip(
        jax.tree_util.tree_flatten_with_path(gp(blk_f))[0],
        jax.tree_util.tree_flatten_with_path(gp(blk_m))[0],
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(kw_))


def test_remat_stage_with_fused_block():
    """1024²-style remat wrapping (jax.checkpoint around each block) must
    compose with the whole-block custom_vjp."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers \
        import BasicLayer

    kw = dict(dim=128, depth=2, num_heads=4, window_size=4,
              downsample=False)
    st_x = BasicLayer(use_remat=True, **kw)
    st_f = BasicLayer(use_remat=True, use_fused_block=True, **kw)
    x = (jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 128)) * 0.5)
    params = jax.jit(st_x.init)(jax.random.PRNGKey(0), x)

    def loss(blk):
        def f(p, xx):
            out = blk.apply(p, xx)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out * out)
        return f

    vx, gx = jax.value_and_grad(loss(st_x))(params, x)
    vf, gf = jax.value_and_grad(loss(st_f))(params, x)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)
    for (k_, w), (_, g) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(k_))


def test_full_model_routing_matches():
    """Whole MS-UNet with FUSED_BLOCK: C<=512 stages ride the block
    kernel, the C=1024 bottleneck falls back — logits must match the
    per-op model."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import (
        MSUNet,
    )

    kw = dict(img_size=64, embed_dim=128, depths=(1, 1, 1, 1),
              num_heads=(4, 8, 16, 32), window_size=7)
    m_x = MSUNet(**kw)
    m_f = MSUNet(use_fused_block=True, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda: m_x.init({"params": jax.random.PRNGKey(0)}, x,
                                 True))()
    want = m_x.apply(v, x, True)
    got = m_f.apply(v, x, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4)
