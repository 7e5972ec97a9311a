"""Weight converter tests: key mapping, transposes, encoder remap tables."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.models.weight_convert import (
    convert_msunet_state_dict,
    load_pretrained_encoder,
    remap_encoder_keys,
    torch_key_to_flax_path,
)

SMALL = dict(img_size=64, embed_dim=16, depths=(2, 2, 2, 2),
             num_heads=(2, 2, 2, 2), window_size=4)


@pytest.fixture(scope="module")
def params():
    model = MSUNet(**SMALL)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 3)), True)
    return v["params"]


def test_key_mapping_table():
    cases = {
        "patch_embed.proj.weight": (("patch_embed", "proj", "kernel"), "conv_t"),
        "patch_embed.proj.bias": (("patch_embed", "proj", "bias"), "copy"),
        "patch_embed.norm.weight": (("patch_embed", "norm", "scale"), "copy"),
        "layers.0.blocks.1.attn.qkv.weight":
            (("layers_0", "blocks_1", "attn", "qkv", "kernel"), "linear_t"),
        "layers.0.blocks.1.attn.proj.weight":
            (("layers_0", "blocks_1", "attn", "proj", "kernel"), "linear_t"),
        "layers.2.blocks.17.mlp.0.weight":
            (("layers_2", "blocks_17", "mlp", "fc1", "kernel"), "linear_t"),
        "layers.2.blocks.17.mlp.3.bias":
            (("layers_2", "blocks_17", "mlp", "fc2", "bias"), "copy"),
        "layers.1.downsample.reduction.weight":
            (("layers_1", "downsample", "reduction", "kernel"), "linear_t"),
        "layers.1.downsample.norm.weight":
            (("layers_1", "downsample", "norm", "scale"), "copy"),
        "layers_up.0.expand.weight":
            (("layers_up_0", "expand", "kernel"), "linear_t"),
        "layers_up.1.upsample.norm.bias":
            (("layers_up_1", "upsample", "norm", "bias"), "copy"),
        "concat_back_dim.3.weight":
            (("concat_back_dim_3", "kernel"), "linear_t"),
        "layers_cent1.2.blocks.0.norm1.weight":
            (("layers_cent1_2", "blocks_0", "norm1", "scale"), "copy"),
        "norm.weight": (("norm", "scale"), "copy"),
        "norm_up.bias": (("norm_up", "bias"), "copy"),
        "up.expand.weight": (("up", "expand", "kernel"), "linear_t"),
        "up.refine1.weight": (("up", "refine1", "kernel"), "conv_t"),
        "up.norm.weight": (("up", "norm", "scale"), "copy"),
        "output.weight": (("output", "kernel"), "conv_t"),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            (("layers_0", "blocks_0", "attn", "relative_position_bias_table"),
             "copy"),
    }
    for k, want in cases.items():
        assert torch_key_to_flax_path(k) == want, k
    assert torch_key_to_flax_path(
        "layers.0.blocks.0.attn.relative_position_index") is None


def _fake_torch_sd_from_params(params, prefix_filter=None):
    """Build a reference-keyed state dict with values derived from the
    flax tree (reverse transform), so a converter round trip is checkable."""
    flat = traverse_util.flatten_dict(params["msunet"])
    sd = {}
    rng = np.random.RandomState(0)
    for path, v in flat.items():
        # reconstruct a torch key from the flax path
        parts = []
        for p in path[:-1]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit() and p.split("_")[0] in (
                "layers", "blocks", "concat", "layers_up".split("_")[0]
            ):
                pass
            parts.append(p)
        torch_parts = []
        for p in path[:-1]:
            if p.startswith(("layers_up_", "layers_cent1_", "layers_cent2_")):
                base, idx = p.rsplit("_", 1)
                torch_parts.append(f"{base}.{idx}")
            elif p.startswith(("layers_", "blocks_", "concat_back_dim_")):
                base, idx = p.rsplit("_", 1)
                torch_parts.append(f"{base}.{idx}")
            elif p == "mlp":
                torch_parts.append("mlp")
            elif p in ("fc1", "fc2"):
                torch_parts[-1] = "mlp"
                torch_parts.append("0" if p == "fc1" else "3")
            else:
                torch_parts.append(p)
        leaf = path[-1]
        if leaf == "scale":
            leaf_t = "weight"
        elif leaf == "kernel":
            leaf_t = "weight"
        else:
            leaf_t = leaf
        key = ".".join(torch_parts + [leaf_t])
        if prefix_filter and not key.startswith(prefix_filter):
            continue
        val = rng.randn(*np.shape(v)).astype(np.float32)
        arr = np.asarray(val)
        if leaf == "kernel" and arr.ndim == 2:
            arr = arr.T  # torch linear layout
        elif leaf == "kernel" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # torch conv layout
        sd[key] = arr
    return sd


def test_full_state_dict_round_trip(params):
    sd = _fake_torch_sd_from_params({"msunet": params["msunet"]})
    new_params = convert_msunet_state_dict(sd, params, logging)
    flat_old = traverse_util.flatten_dict(params)
    flat_new = traverse_util.flatten_dict(new_params)
    changed = sum(
        not np.array_equal(np.asarray(flat_old[k]), np.asarray(flat_new[k]))
        for k in flat_old
    )
    # every leaf should have been replaced by checkpoint values
    assert changed == len(flat_old), f"only {changed}/{len(flat_old)} replaced"
    # spot-check a transpose: torch qkv (3C, C) -> flax (C, 3C)
    k = "layers.0.blocks.0.attn.qkv.weight"
    got = flat_new[("msunet", "layers_0", "blocks_0", "attn", "qkv", "kernel")]
    np.testing.assert_array_equal(np.asarray(got), sd[k].T)


def test_shape_mismatch_raises(params):
    sd = {"layers.0.blocks.0.attn.qkv.weight": np.zeros((7, 7), np.float32)}
    with pytest.raises(ValueError, match="does not match"):
        convert_msunet_state_dict(sd, params, logging)


def test_remap_encoder_keys_imagenet1k():
    sd = {
        "features.0.0.weight": 1, "features.0.2.bias": 2,
        "features.1.0.norm1.weight": 3, "features.1.1.mlp.0.weight": 4,
        "features.2.reduction.weight": 5,
        "features.5.17.attn.qkv.weight": 6,
        "features.5.1.attn.qkv.weight": 7,
        "features.7.1.norm2.bias": 8,
        "norm.weight": 9, "head.weight": 10,  # outside features: dropped
    }
    out = remap_encoder_keys(sd, "imagenet1k")
    assert out["patch_embed.proj.weight"] == 1
    assert out["patch_embed.norm.bias"] == 2
    assert out["layers.0.blocks.0.norm1.weight"] == 3
    assert out["layers.0.blocks.1.mlp.0.weight"] == 4
    assert out["layers.0.downsample.reduction.weight"] == 5
    assert out["layers.2.blocks.17.attn.qkv.weight"] == 6
    assert out["layers.2.blocks.1.attn.qkv.weight"] == 7
    assert out["layers.3.blocks.1.norm2.bias"] == 8
    assert "norm.weight" not in out


def test_remap_encoder_keys_segface_skips_decode_head():
    sd = {
        "backbone.0.0.0.weight": 1,
        "backbone.0.5.9.norm1.weight": 2,
        "backbone.1.decoder.weight": 3,  # face-parser head: skipped
    }
    out = remap_encoder_keys(sd, "segface")
    assert out["patch_embed.proj.weight"] == 1
    assert out["layers.2.blocks.9.norm1.weight"] == 2
    assert len(out) == 2


def test_remap_unknown_key_raises():
    with pytest.raises(ValueError, match="not found in dictionary"):
        remap_encoder_keys({"features.9.whatever": 0}, "imagenet1k")
    with pytest.raises(ValueError, match="No new keys"):
        remap_encoder_keys({"unrelated.key": 0}, "imagenet1k")


def test_load_pretrained_encoder_end_to_end(params, tmp_path):
    """Real flow with a torch-saved file: encoder leaves replaced,
    decoder untouched."""
    import torch

    model_sd = _fake_torch_sd_from_params(
        {"msunet": params["msunet"]},
    )
    # keep only encoder keys, rename to torchvision features.* space
    ref_to_tv = {
        "patch_embed.proj.": "features.0.0.",
        "patch_embed.norm.": "features.0.2.",
        "layers.0.blocks.0.": "features.1.0.",
        "layers.0.blocks.1.": "features.1.1.",
        "layers.0.downsample.": "features.2.",
        "layers.1.blocks.0.": "features.3.0.",
        "layers.1.blocks.1.": "features.3.1.",
        "layers.1.downsample.": "features.4.",
        "layers.2.blocks.0.": "features.5.0.",
        "layers.2.blocks.1.": "features.5.1.",
        "layers.2.downsample.": "features.6.",
        "layers.3.blocks.0.": "features.7.0.",
        "layers.3.blocks.1.": "features.7.1.",
    }
    tv_sd = {}
    for k, v in model_sd.items():
        for ref_prefix, tv_prefix in ref_to_tv.items():
            if k.startswith(ref_prefix):
                tv_sd[tv_prefix + k[len(ref_prefix):]] = torch.tensor(v)
                break
    path = str(tmp_path / "swin_b_fake.pth")
    torch.save(tv_sd, path)

    new_params = load_pretrained_encoder(params, path, "imagenet1k", logging)
    flat_old = traverse_util.flatten_dict(params)
    flat_new = traverse_util.flatten_dict(new_params)
    enc_changed = dec_changed = 0
    for k in flat_old:
        changed = not np.array_equal(np.asarray(flat_old[k]),
                                     np.asarray(flat_new[k]))
        joined = "/".join(k)
        if "/layers_" in joined and "layers_up" not in joined and \
                "layers_cent" not in joined or "patch_embed" in joined:
            enc_changed += changed
        else:
            dec_changed += changed
            assert not changed, f"decoder param changed: {joined}"
    assert enc_changed > 40


def test_missing_file_returns_unchanged(params):
    out = load_pretrained_encoder(params, "/nonexistent.pt", "segface", logging)
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(out)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
