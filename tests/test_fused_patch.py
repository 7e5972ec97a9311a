"""Fused PatchMerging/PatchExpand Pallas kernels vs the XLA path.

Runs the kernels in the Pallas interpreter on CPU and asserts forward and
VJP parity against the exact op sequences of the XLA fallback
(``ops/patch_ops`` + ``apply_layer_norm`` + the bias-free Linear),
including row counts that don't divide the tile, bf16, the grid-wide
weight-gradient accumulation, the module-level routing, and the
shard_map data-parallel wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
    PatchExpand,
    PatchMerging,
    apply_layer_norm,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_patch as fp,
    patch_ops,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fp, "INTERPRET", True)


def _merge_inputs(key, b, h, w, c, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return dict(
        x=(jax.random.normal(ks[0], (b, h, w, c)) * 0.5).astype(dtype),
        sc=1.0 + 0.1 * jax.random.normal(ks[1], (4 * c,)),
        lb=0.1 * jax.random.normal(ks[2], (4 * c,)),
        wk=0.05 * jax.random.normal(ks[3], (4 * c, 2 * c)),
    )


def _xla_merge(x, sc, lb, wk):
    dt = x.dtype
    m = patch_ops.merge_2x2(x)
    n = apply_layer_norm(m, sc, lb, dt)
    return jax.lax.dot_general(
        n, wk.astype(dt), (((n.ndim - 1,), (0,)), ((), ()))
    )


def _expand_inputs(key, b, h, w, c, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return dict(
        x=(jax.random.normal(ks[0], (b, h, w, c)) * 0.5).astype(dtype),
        wk=0.05 * jax.random.normal(ks[1], (c, 2 * c)),
        sc=1.0 + 0.1 * jax.random.normal(ks[2], (c // 2,)),
        lb=0.1 * jax.random.normal(ks[3], (c // 2,)),
    )


def _xla_expand(x, wk, sc, lb):
    dt = x.dtype
    z = jax.lax.dot_general(
        x, wk.astype(dt), (((x.ndim - 1,), (0,)), ((), ()))
    )
    z = patch_ops.depth_to_space(z, 2)
    return apply_layer_norm(z, sc, lb, dt)


MERGE_CASES = [
    # (B, H, W, C, dtype) — odd B*H/2 row counts exercise tile padding
    (2, 8, 8, 128, jnp.float32),
    (1, 6, 10, 128, jnp.float32),
    (3, 4, 4, 256, jnp.float32),
    (2, 8, 8, 128, jnp.bfloat16),
]


@pytest.mark.parametrize("b,h,w,c,dtype", MERGE_CASES)
def test_merge_forward_parity(b, h, w, c, dtype):
    inp = _merge_inputs(jax.random.PRNGKey(0), b, h, w, c, dtype)
    got = fp.fused_patch_merge(inp["x"], inp["sc"], inp["lb"], inp["wk"])
    want = _xla_merge(inp["x"], inp["sc"], inp["lb"],
                      inp["wk"].astype(dtype))
    assert got.shape == (b, h // 2, w // 2, 2 * c)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("b,h,w,c,dtype", MERGE_CASES[:3])
def test_merge_grad_parity(b, h, w, c, dtype):
    inp = _merge_inputs(jax.random.PRNGKey(1), b, h, w, c, dtype)
    args = (inp["x"], inp["sc"], inp["lb"], inp["wk"])

    def loss_fused(x, sc, lb, wk):
        y = fp.fused_patch_merge(x, sc, lb, wk)
        return jnp.sum(y.astype(jnp.float32) * jnp.cos(
            jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))

    def loss_xla(x, sc, lb, wk):
        y = _xla_merge(x, sc, lb, wk.astype(x.dtype))
        return jnp.sum(y.astype(jnp.float32) * jnp.cos(
            jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-3, rtol=5e-3)


EXPAND_CASES = [
    (2, 4, 4, 256, jnp.float32),
    (1, 3, 5, 256, jnp.float32),
    (2, 2, 2, 512, jnp.float32),
    (2, 4, 4, 256, jnp.bfloat16),
]


@pytest.mark.parametrize("b,h,w,c,dtype", EXPAND_CASES)
def test_expand_forward_parity(b, h, w, c, dtype):
    inp = _expand_inputs(jax.random.PRNGKey(2), b, h, w, c, dtype)
    got = fp.fused_patch_expand(inp["x"], inp["wk"], inp["sc"], inp["lb"])
    want = _xla_expand(inp["x"], inp["wk"].astype(dtype),
                       inp["sc"], inp["lb"])
    assert got.shape == (b, 2 * h, 2 * w, c // 2)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("b,h,w,c,dtype", EXPAND_CASES[:3])
def test_expand_grad_parity(b, h, w, c, dtype):
    inp = _expand_inputs(jax.random.PRNGKey(3), b, h, w, c, dtype)
    args = (inp["x"], inp["wk"], inp["sc"], inp["lb"])

    def loss_fused(x, wk, sc, lb):
        y = fp.fused_patch_expand(x, wk, sc, lb)
        return jnp.sum(y.astype(jnp.float32) * jnp.sin(
            1.0 + jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))

    def loss_xla(x, wk, sc, lb):
        y = _xla_expand(x, wk.astype(x.dtype), sc, lb)
        return jnp.sum(y.astype(jnp.float32) * jnp.sin(
            1.0 + jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-3, rtol=5e-3)


def test_supported_gates():
    assert fp.merge_supported((2, 8, 8, 128))
    assert not fp.merge_supported((2, 7, 8, 128))   # odd H
    assert not fp.merge_supported((2, 8, 8, 96))    # lane alignment
    assert not fp.merge_supported((2, 8, 8, 1024))  # over the dim cap
    assert fp.expand_supported((2, 4, 4, 256))
    assert fp.expand_supported((2, 4, 4, 1024))
    assert not fp.expand_supported((2, 4, 4, 128))  # C/2 = 64 unaligned
    assert not fp.expand_supported((2, 4, 4, 2048))  # over the dim cap


def test_dim_cap_env_override(monkeypatch):
    monkeypatch.setenv("SSA_FUSED_PATCH_DIM_CAP", "128")
    assert fp.merge_supported((2, 8, 8, 128))
    assert not fp.merge_supported((2, 8, 8, 256))
    assert not fp.expand_supported((2, 4, 4, 256))


def test_module_routing_merge():
    """PatchMerging with use_fused_patch routes through the kernel and
    matches its own XLA path on the same params."""
    x = (jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 128)) * 0.5)
    m_x = PatchMerging(dim=128)
    m_k = PatchMerging(dim=128, use_fused_patch=True)
    params = m_x.init(jax.random.PRNGKey(5), x)
    a = m_x.apply(params, x)
    b = m_k.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_module_routing_expand():
    x = (jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 256)) * 0.5)
    m_x = PatchExpand(dim=256)
    m_k = PatchExpand(dim=256, use_fused_patch=True)
    params = m_x.init(jax.random.PRNGKey(7), x)
    a = m_x.apply(params, x)
    b = m_k.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_module_param_tree_unchanged():
    """The setup()-holder rewrite must keep the nn.Dense/nn.LayerNorm
    parameter tree (checkpoint compatibility)."""
    x = jnp.zeros((1, 4, 4, 128))
    pm = PatchMerging(dim=128).init(jax.random.PRNGKey(0), x)["params"]
    assert set(pm) == {"norm", "reduction"}
    assert set(pm["norm"]) == {"scale", "bias"}
    assert set(pm["reduction"]) == {"kernel"}
    assert pm["reduction"]["kernel"].shape == (512, 256)
    x = jnp.zeros((1, 4, 4, 256))
    pe = PatchExpand(dim=256).init(jax.random.PRNGKey(0), x)["params"]
    assert set(pe) == {"norm", "expand"}
    assert pe["expand"]["kernel"].shape == (256, 512)
    assert pe["norm"]["scale"].shape == (128,)


def test_shard_map_dp_wrapper():
    """Batch-sharded kernel execution matches the unsharded kernel."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    inp = _merge_inputs(jax.random.PRNGKey(8), 4, 8, 8, 128)
    a = fp.fused_patch_merge(inp["x"], inp["sc"], inp["lb"], inp["wk"])
    b = fp.fused_patch_merge(inp["x"], inp["sc"], inp["lb"], inp["wk"],
                             data_mesh=mesh)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)

    einp = _expand_inputs(jax.random.PRNGKey(9), 4, 4, 4, 256)
    a = fp.fused_patch_expand(einp["x"], einp["wk"], einp["sc"], einp["lb"])
    b = fp.fused_patch_expand(einp["x"], einp["wk"], einp["sc"], einp["lb"],
                              data_mesh=mesh)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_full_model_routing_parity():
    """MSUNet with FUSED_PATCH on (real widths so every merge/expand
    qualifies) matches the XLA model's logits on the same params."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import (
        MSUNet,
    )

    common = dict(img_size=32, embed_dim=128, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=7,
                  drop_path_rate=0.0, dtype=jnp.float32)
    m_x = MSUNet(**common)
    m_k = MSUNet(use_fused_patch=True, **common)
    x = (jax.random.normal(jax.random.PRNGKey(10), (1, 32, 32, 3)) * 0.5)
    params = jax.jit(lambda: m_x.init(
        {"params": jax.random.PRNGKey(0)}, x, True))()
    a = jax.jit(lambda p, v: m_x.apply(p, v, True))(params, x)
    b = jax.jit(lambda p, v: m_k.apply(p, v, True))(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_remat_stage_with_fused_patch():
    """1024²-style remat wrapping must compose with the patch-kernel
    custom_vjp (the PatchMerging sits inside the remat-wrapped stage)."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers \
        import BasicLayer

    kw = dict(dim=128, depth=1, num_heads=4, window_size=4,
              downsample=True)
    st_x = BasicLayer(use_remat=True, **kw)
    st_f = BasicLayer(use_remat=True, use_fused_patch=True, **kw)
    x = (jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 128)) * 0.5)
    params = jax.jit(st_x.init)(jax.random.PRNGKey(0), x)

    def loss(blk):
        def f(p, xx):
            out = blk.apply(p, xx)
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


def test_train_step_with_fused_patch():
    """Full jitted train step (loss+bwd+AdamW) with FUSED_PATCH on must
    match the XLA-path step on the same state (real widths)."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import (
        MSUNet,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
        create_train_state,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
        make_train_step,
    )

    common = dict(img_size=32, embed_dim=128, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=7,
                  drop_path_rate=0.0, dtype=jnp.float32)
    m_x = MSUNet(**common)
    m_k = MSUNet(use_fused_patch=True, **common)
    config = default_config()
    config.defrost()
    config.DATA.IMG_SIZE = 32
    config.MODEL.FREEZE_ENCODER = False
    config.freeze()
    state = create_train_state(m_x, config, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    lbl = (rng.rand(2, 32, 32) > 0.8).astype(np.uint8)
    s_x = make_train_step(m_x, 0.2, 0.8, 0.45, donate=False)
    s_k = make_train_step(m_k, 0.2, 0.8, 0.45, donate=False)
    _, l_x = s_x(state, jnp.asarray(img), jnp.asarray(lbl),
                 jnp.asarray(1e-3))
    _, l_k = s_k(state, jnp.asarray(img), jnp.asarray(lbl),
                 jnp.asarray(1e-3))
    assert abs(float(l_x) - float(l_k)) < 1e-5, (float(l_x), float(l_k))
