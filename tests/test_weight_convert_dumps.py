"""Weight-converter validation against the reference's OWN key/shape dumps.

The reference ships exact key→shape inventories of the three checkpoint
families it ingests (``/root/reference/network/pretrained_weights/``):

* ``structure_of_MSUNet.txt``   — the trained model's encoder key space
  (``ms_unet.*``, what ``best_model.pth`` payloads contain),
* ``IMAGENET1K_structure.txt``  — torchvision ``swin_b`` IMAGENET1K
  (``features.*`` + classifier head),
* ``structure_of_SegFace.txt``  — the SegFace face-parser backbone
  (``backbone.0.*`` + ``backbone.1.*`` decode head).

These tests parse the dumps, push every key through the converter paths
the CLIs use, and assert (a) zero unmapped checkpoint keys, (b) exact
shape agreement with the flax tree after transpose transforms, and
(c) complete coverage of the flax encoder leaves — so any drift vs the
true torchvision layout (e.g. ``features.5.17.*``,
``relative_position_bias_table [169, heads]``) fails here, without
needing a real ``.pth``. Tree shapes come from ``jax.eval_shape`` (no
compute), so the full Swin-B config is cheap to check.
"""

import os
import re

import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.models.weight_convert import (
    remap_encoder_keys,
    torch_key_to_flax_path,
)

DUMP_DIR = "/root/reference/network/pretrained_weights"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DUMP_DIR), reason="reference dumps not mounted"
)

_LINE = re.compile(r"^\s*\d+\s*:\s*(\S+)\s+torch\.Size\(\[([^\]]*)\]\)")


def parse_dump(name):
    """dump file -> {torch_key: shape tuple}."""
    out = {}
    with open(os.path.join(DUMP_DIR, name)) as fh:
        for line in fh:
            m = _LINE.match(line)
            if m:
                dims = m.group(2).strip()
                out[m.group(1)] = tuple(
                    int(d) for d in dims.split(",") if d.strip()
                )
    assert out, f"no keys parsed from {name}"
    return out


@pytest.fixture(scope="module")
def swinb_flat():
    """Full Swin-B MS-UNet param tree SHAPES (eval_shape: no compute)."""
    model = MSUNet(img_size=224, embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), window_size=7)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    tree = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, True)
    )
    return dict(traverse_util.flatten_dict(tree["params"]["msunet"]))


def _expected_flax_shape(torch_shape, transform):
    if transform == "linear_t":
        return tuple(reversed(torch_shape))
    if transform == "conv_t":
        o, i, kh, kw = torch_shape
        return (kh, kw, i, o)
    return tuple(torch_shape)


def _assert_maps_fully(ref_keyed, swinb_flat):
    """Every reference-space key maps to an existing leaf w/ exact shape."""
    hit = set()
    for key, shape in ref_keyed.items():
        mapped = torch_key_to_flax_path(key)
        if mapped is None:
            assert key.endswith(("relative_position_index", "attn_mask")), key
            continue
        path, transform = mapped
        assert path in swinb_flat, f"{key} -> {path} not in flax tree"
        want = _expected_flax_shape(shape, transform)
        got = tuple(swinb_flat[path].shape)
        assert got == want, f"{key}: flax {got} != checkpoint {want}"
        hit.add(path)
    return hit


ENCODER_PREFIXES = ("patch_embed", "layers_0", "layers_1", "layers_2",
                    "layers_3")


def _encoder_leaves(swinb_flat):
    return {p for p in swinb_flat if p[0] in ENCODER_PREFIXES}


def test_msunet_dump_maps_and_covers_encoder(swinb_flat):
    dump = parse_dump("structure_of_MSUNet.txt")
    # the trainer payload prefixes module keys with 'ms_unet.' — the CLIs
    # strip it before conversion (cli/test_cli.py) ; do the same here
    stripped = {k[len("ms_unet."):]: v for k, v in dump.items()}
    assert len(stripped) == len(dump)
    hit = _assert_maps_fully(stripped, swinb_flat)
    missing = _encoder_leaves(swinb_flat) - hit
    assert not missing, f"encoder leaves not covered by dump: {sorted(missing)}"


@pytest.mark.parametrize("dump_name,kind", [
    ("IMAGENET1K_structure.txt", "imagenet1k"),
    ("structure_of_SegFace.txt", "segface"),
])
def test_pretrain_dumps_remap_and_cover_encoder(swinb_flat, dump_name, kind):
    dump = parse_dump(dump_name)
    remapped = remap_encoder_keys(dump, kind)
    # every surviving key must carry its shape through the remap
    assert all(isinstance(v, tuple) for v in remapped.values())
    hit = _assert_maps_fully(remapped, swinb_flat)
    missing = _encoder_leaves(swinb_flat) - hit
    assert not missing, f"{kind}: encoder leaves not covered: {sorted(missing)}"
    # classifier head / decode head keys must be dropped, not mismapped
    for k in remapped:
        assert not k.startswith(("head", "backbone.1")), k


def test_dump_driven_conversion_replaces_every_key(swinb_flat):
    """convert_msunet_state_dict with a dump-shaped synthetic sd: zero skips."""
    import numpy as np

    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.weight_convert import (
        convert_msunet_state_dict,
    )

    dump = parse_dump("structure_of_MSUNet.txt")
    stripped = {k[len("ms_unet."):]: np.full(v, 7.25, np.float32)
                for k, v in dump.items()}
    # materialize a real (tiny-footprint irrelevant: full tree is ~150MB fp32,
    # fine on CPU) param tree of zeros from the eval_shape leaves
    params = traverse_util.unflatten_dict(
        {("msunet",) + p: np.zeros(s.shape, np.float32)
         for p, s in swinb_flat.items()}
    )
    merged = convert_msunet_state_dict(stripped, params, strict_shapes=True)
    flat = traverse_util.flatten_dict(merged)
    n_expected = sum(
        1 for k in stripped if torch_key_to_flax_path(k) is not None
    )
    n_replaced = sum(1 for v in flat.values() if float(v.flat[0]) == 7.25)
    assert n_replaced == n_expected, (n_replaced, n_expected)
