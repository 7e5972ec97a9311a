"""MS-UNet model structure + wiring tests (small config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.models.msunet import MSUNetSys
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import patch_ops

SMALL = dict(
    img_size=64, embed_dim=16, depths=(2, 2, 4, 2), num_heads=(2, 2, 2, 2),
    window_size=4,
)


@pytest.fixture(scope="module")
def small_model_and_params():
    model = MSUNet(**SMALL)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    return model, params


def test_output_shape(small_model_and_params):
    model, params = small_model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = model.apply(params, x, True)
    assert out.shape == (2, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_param_tree_structure(small_model_and_params):
    _, params = small_model_and_params
    p = params["params"]["msunet"]
    # encoder stages + merges
    for i in range(4):
        assert f"layers_{i}" in p
        blocks = [k for k in p[f"layers_{i}"] if k.startswith("blocks_")]
        assert len(blocks) == SMALL["depths"][i]
    for i in range(3):
        assert "downsample" in p[f"layers_{i}"]
    assert "downsample" not in p["layers_3"]
    # decoder quirk: layers_up_1 depth = encoder depths[2]
    up1_blocks = [k for k in p["layers_up_1"] if k.startswith("blocks_")]
    assert len(up1_blocks) == SMALL["depths"][2]  # 4, not a "decoder depth"
    # cent decoders
    assert "layers_cent1_0" in p and "layers_cent1_2" in p
    assert "layers_cent2_0" in p and "layers_cent2_1" in p
    assert "layers_cent2_2" not in p
    # shared concat_back_dim linears exist once
    for i in (1, 2, 3):
        assert f"concat_back_dim_{i}" in p
    # attention params have the contract shapes
    attn = p["layers_0"]["blocks_0"]["attn"]
    w = SMALL["window_size"]
    assert attn["relative_position_bias_table"].shape == (
        (2 * w - 1) ** 2,
        SMALL["num_heads"][0],
    )
    assert attn["qkv"]["kernel"].shape == (16, 48)
    assert attn["proj"]["kernel"].shape == (16, 16)
    # final head
    assert p["up"]["expand"]["kernel"].shape == (16, 256)
    assert p["output"]["kernel"].shape == (1, 1, 16, 1)


def test_52_block_structure_at_reference_depths():
    """Reference block count: 24 enc + 22 dec + 4 cent1 + 2 cent2 = 52."""
    model = MSUNetSys(
        img_size=64, embed_dim=8, depths=(2, 2, 18, 2), num_heads=(1, 1, 1, 1),
        window_size=4,
    )
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), True)
    )
    p = shapes["params"]
    n_blocks = 0
    def count(tree, prefix=""):
        nonlocal n_blocks
        for k, v in tree.items():
            if k.startswith("blocks_"):
                n_blocks += 1
            elif isinstance(v, dict):
                count(v, prefix + k + "/")
    count(p)
    assert n_blocks == 52


def test_grey_input_broadcast(small_model_and_params):
    model, params = small_model_and_params
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 1))
    out1 = model.apply(params, x1, True)
    out3 = model.apply(params, jnp.repeat(x1, 3, axis=-1), True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=1e-6)


def test_wrong_size_raises(small_model_and_params):
    model, params = small_model_and_params
    with pytest.raises(ValueError):
        model.apply(params, jnp.zeros((1, 32, 32, 3)), True)


def test_deterministic_eval(small_model_and_params):
    model, params = small_model_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    a = model.apply(params, x, True)
    b = model.apply(params, x, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stochastic_depth_training_mode():
    model = MSUNet(**SMALL, drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    a = model.apply(params, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval mode unaffected by drop path
    c = model.apply(params, x, True)
    d = model.apply(params, x, True)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_cent_decoders_rewrite_skips():
    """Zeroing a cent-decoder parameter must change the output: the cent
    pipelines feed the main decoder through rewritten skips."""
    model = MSUNet(**SMALL)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    base = model.apply(params, x, True)

    mutated = jax.tree_util.tree_map(lambda a: a, params)  # copy refs
    import flax
    flat = flax.traverse_util.flatten_dict(mutated["params"])
    hit = 0
    for k in list(flat):
        if "layers_cent2_0" in k and k[-1] == "kernel":
            flat[k] = jnp.zeros_like(flat[k])
            hit += 1
    assert hit > 0
    mutated = {"params": flax.traverse_util.unflatten_dict(flat)}
    out = model.apply(mutated, x, True)
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_patch_ops_merge_expand_inverse():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    m = patch_ops.merge_2x2(x)
    assert m.shape == (2, 4, 4, 16)
    # depth_to_space with matching order must invert merge up to channel order
    # x0 block of merge = even rows/cols
    np.testing.assert_array_equal(np.asarray(m[..., :4]), np.asarray(x[:, 0::2, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(m[..., 4:8]), np.asarray(x[:, 1::2, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(m[..., 8:12]), np.asarray(x[:, 0::2, 1::2, :]))
    np.testing.assert_array_equal(np.asarray(m[..., 12:]), np.asarray(x[:, 1::2, 1::2, :]))

    y = jnp.arange(1 * 2 * 2 * 8, dtype=jnp.float32).reshape(1, 2, 2, 8)
    d = patch_ops.depth_to_space(y, 2)
    assert d.shape == (1, 4, 4, 2)
    # einops '(p1 p2 c)' ordering: out[h*2+p1, w*2+p2, c] = in[h, w, (p1*2+p2)*2+c]
    np.testing.assert_array_equal(np.asarray(d[0, 0, 0]), np.asarray(y[0, 0, 0, 0:2]))
    np.testing.assert_array_equal(np.asarray(d[0, 0, 1]), np.asarray(y[0, 0, 0, 2:4]))
    np.testing.assert_array_equal(np.asarray(d[0, 1, 0]), np.asarray(y[0, 0, 0, 4:6]))
    np.testing.assert_array_equal(np.asarray(d[0, 1, 1]), np.asarray(y[0, 0, 0, 6:8]))


@pytest.mark.parametrize("window_size", [4, 7])
def test_hold_layout_matches_spatial_path(window_size):
    """TPU.HOLD_WINDOW_LAYOUT runs a stage's blocks in window-major layout
    (one relayout per shift change instead of six per block); forward and
    gradients must match the per-block spatial path to float rounding."""
    kw = dict(img_size=64, embed_dim=16, depths=(2, 2, 2, 2),
              num_heads=(2, 2, 2, 2), window_size=window_size,
              dtype=jnp.float32, softmax_dtype=jnp.float32)
    m_sp = MSUNet(hold_layout=False, **kw)
    m_hl = MSUNet(hold_layout=True, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = jax.jit(lambda r, x: m_sp.init({"params": r}, x, True))(
        jax.random.PRNGKey(1), x)
    o_sp = jax.jit(lambda v, x: m_sp.apply(v, x, True))(v, x)
    o_hl = jax.jit(lambda v, x: m_hl.apply(v, x, True))(v, x)
    np.testing.assert_allclose(np.asarray(o_hl), np.asarray(o_sp),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        return lambda v: jnp.mean(m.apply(v, x, True) ** 2)

    g_sp = jax.jit(jax.grad(loss(m_sp)))(v)
    g_hl = jax.jit(jax.grad(loss(m_hl)))(v)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_sp, g_hl)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_pointwise_conv_matches_nn_conv_1x1():
    """The head's PointwiseConv (dot_general lowering) must be a drop-in
    for ``nn.Conv(features, (1,1), use_bias=False)``: same param layout
    (``kernel`` of shape (1,1,C,F)) and identical outputs/grads."""
    from flax import linen as nn

    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
        PointwiseConv,
        conv_torch_init,
    )

    pw = PointwiseConv(3, dtype=jnp.float32)
    cv = nn.Conv(3, kernel_size=(1, 1), use_bias=False,
                 kernel_init=conv_torch_init, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    v = pw.init(jax.random.PRNGKey(1), x)
    assert v["params"]["kernel"].shape == (1, 1, 8, 3)
    np.testing.assert_allclose(
        np.asarray(pw.apply(v, x)), np.asarray(cv.apply(v, x)),
        rtol=1e-6, atol=1e-6)
    g_pw = jax.grad(lambda v: jnp.sum(pw.apply(v, x) ** 2))(v)
    g_cv = jax.grad(lambda v: jnp.sum(cv.apply(v, x) ** 2))(v)
    np.testing.assert_allclose(
        np.asarray(g_pw["params"]["kernel"]),
        np.asarray(g_cv["params"]["kernel"]), rtol=1e-5, atol=1e-5)
