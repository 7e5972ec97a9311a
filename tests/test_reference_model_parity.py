"""Golden end-to-end parity vs the reference's OWN model code.

The reference's ``network/model_parts.py`` (52-block MS-UNet assembly:
cent decoders firing inside the encoder pass, shared ``concat_back_dim``
Linears, the decoder-depth quirk) is executed directly on CPU torch via
the minimal torchvision/timm shims in ``tests/_torch_shims`` — so the
graph wiring under test is the reference author's actual code, not a
re-description of it.  Its weights are converted with
``models.weight_convert.convert_msunet_state_dict`` and the two models
must produce matching logits.

The shim's attention numerics are independently cross-checked here
against ``ops/window_attention.py`` (whose own oracle is numpy-based,
``tests/test_window_attention.py``) before the end-to-end comparison.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SHIMS = os.path.join(os.path.dirname(__file__), "_torch_shims")
_REF = "/root/reference/network"


@pytest.fixture(scope="module")
def ref_model_parts():
    if not os.path.isdir(_REF):
        pytest.skip("reference tree not available")
    added = []
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    for mod in ("timm", "timm.layers", "torchvision", "torchvision.models",
                "torchvision.models.swin_transformer", "torchvision.ops"):
        sys.modules.pop(mod, None)
    sys.modules.pop("model_parts", None)
    import model_parts  # the reference's own module

    yield model_parts
    for p in added:
        sys.path.remove(p)


def test_shim_attention_matches_jax_op(ref_model_parts):
    """The torch shim block core vs our XLA attention op (independent
    implementations; ours is numpy-oracle-tested)."""
    import jax
    import jax.numpy as jnp

    from semantic_segmentation_of_stylegan2_artifacts_tpu.ops.window_attention import (
        shifted_window_attention as jax_swa,
    )
    from torchvision.models.swin_transformer import ShiftedWindowAttention

    torch.manual_seed(0)
    dim, heads = 16, 2
    for h, w, shift in ((14, 14, 0), (16, 16, 3), (14, 14, 3)):
        attn = ShiftedWindowAttention(dim, [7, 7], [shift, shift], heads)
        attn.eval()
        x = torch.randn(2, h, w, dim)
        with torch.no_grad():
            want = attn(x).numpy()
        got = jax_swa(
            jnp.asarray(x.numpy()),
            jnp.asarray(attn.qkv.weight.detach().numpy().T),
            jnp.asarray(attn.qkv.bias.detach().numpy()),
            jnp.asarray(attn.proj.weight.detach().numpy().T),
            jnp.asarray(attn.proj.bias.detach().numpy()),
            jnp.asarray(attn.relative_position_bias_table.detach().numpy()),
            window_size=(7, 7), shift_size=(shift, shift), num_heads=heads,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   err_msg=f"h={h} w={w} shift={shift}")


@pytest.mark.parametrize("depths,embed,heads", [
    ((2, 2, 2, 2), 16, (2, 2, 2, 2)),
    # asymmetric depths exercise the decoder-depth quirk numerically:
    # the reference's decoder stage 1 reuses ENCODER depths[2] (4 blocks
    # here, 18 in the real model), not DECODER_DEPTHS (SURVEY §2.1)
    ((1, 1, 4, 1), 8, (1, 1, 1, 1)),
])
def test_full_graph_logits_match_reference(ref_model_parts, depths, embed,
                                           heads):
    """Reference MSUNetSys (its own wiring code) == our MSUNet, end to end."""
    import jax
    import jax.numpy as jnp

    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.weight_convert import (
        convert_msunet_state_dict,
    )

    torch.manual_seed(1)
    ref = ref_model_parts.MSUNetSys(
        img_size=224, patch_size=4, in_chans=3, num_classes=1,
        embed_dim=embed, depths=list(depths), depths_decoder=[2, 2, 2, 2],
        num_heads=list(heads), window_size=7, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    ref.eval()

    state_dict = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = MSUNet(img_size=224, embed_dim=embed, depths=depths,
                   num_heads=heads, window_size=7)
    rng = np.random.RandomState(2)
    x_nhwc = rng.rand(2, 224, 224, 3).astype(np.float32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(x_nhwc[:1]), True)["params"]
    params = convert_msunet_state_dict(state_dict, params)

    with torch.no_grad():
        want = ref(torch.from_numpy(
            x_nhwc.transpose(0, 3, 1, 2))).numpy()  # (B, 1, H, W)

    got = model.apply({"params": params}, jnp.asarray(x_nhwc), True)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)

    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, atol=5e-4, rtol=1e-4)


def test_full_graph_logits_match_reference_true_depths(ref_model_parts):
    """End-to-end parity at the REAL Swin-B config: depths (2,2,18,2),
    embed 128, heads (4,8,16,32), window 7 — the exact model the
    reference trains (``/root/reference/config.yaml:33-46``,
    ``network/model_parts.py:610-660``).  The smaller parametrized cases
    above cover the wiring cheaply; this closes the question of whether
    the 18-block decoder stage (the decoder-depth quirk at full depth)
    diverges.  Batch 1 at 224² to bound CPU time."""
    import jax
    import jax.numpy as jnp

    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.weight_convert import (
        convert_msunet_state_dict,
    )

    depths, embed, heads = (2, 2, 18, 2), 128, (4, 8, 16, 32)
    torch.manual_seed(4)
    ref = ref_model_parts.MSUNetSys(
        img_size=224, patch_size=4, in_chans=3, num_classes=1,
        embed_dim=embed, depths=list(depths), depths_decoder=[2, 2, 6, 2],
        num_heads=list(heads), window_size=7, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    ref.eval()
    state_dict = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = MSUNet(img_size=224, embed_dim=embed, depths=depths,
                   num_heads=heads, window_size=7)
    rng = np.random.RandomState(5)
    x_nhwc = rng.rand(1, 224, 224, 3).astype(np.float32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(x_nhwc), True)["params"]
    params = convert_msunet_state_dict(state_dict, params)

    with torch.no_grad():
        want = ref(torch.from_numpy(
            x_nhwc.transpose(0, 3, 1, 2))).numpy()

    got = model.apply({"params": params}, jnp.asarray(x_nhwc), True)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)

    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, atol=5e-4, rtol=1e-4)
