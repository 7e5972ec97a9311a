"""Pallas fused GELU+depth-to-space head kernel vs the composed XLA path.

The kernel (`ops/fused_head.py`) implements the tanh-GELU -> x4
depth-to-space segment of the decoder head (reference
``network/model_parts.py:437-476``, ``FinalPatchExpand_X4_V2``) in one
HBM pass.  These tests run it in the Pallas interpreter on CPU and
assert forward and VJP parity against the composed
``gelu(tanh) -> patch_ops.depth_to_space`` formulation, plus the model
wiring (``TPU.FUSED_HEAD``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_head,
    patch_ops,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fused_head, "INTERPRET", True)


def _reference(x):
    y = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
    return patch_ops.depth_to_space(y.astype(x.dtype), 4)


@pytest.mark.parametrize("shape", [(1, 8, 8, 32), (2, 4, 16, 16)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_composed_path(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    got = fused_head.fused_gelu_d2s4(x)
    want = _reference(x)
    assert got.shape == want.shape == (
        shape[0], 4 * shape[1], 4 * shape[2], shape[3] // 16)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol)


def test_vjp_matches_composed_path():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.float32)

    def loss_fused(x):
        return jnp.sum(jnp.sin(fused_head.fused_gelu_d2s4(x)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(_reference(x)))

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_supported_gates():
    # erf (strict-parity) mode keeps the composed XLA path
    assert not fused_head.supported((1, 8, 8, 32), gelu_tanh=False)
    # channels must carry 4x4 blocks
    assert not fused_head.supported((1, 8, 8, 24), gelu_tanh=True)
    # width chunks stay inside the vmem stack budget and divide W
    assert fused_head._chunk_for(128, 2048) == 128
    assert fused_head._chunk_for(256, 2048) == 128
    for w in (7, 8, 128, 256, 384):
        wc = fused_head._chunk_for(w, 2048)
        assert w % wc == 0 and wc * 2048 <= fused_head._CHUNK_ELEMS
    # INTERPRET mode (patched on) admits CPU
    assert fused_head.supported((1, 8, 8, 32), gelu_tanh=True)


def test_model_head_wiring():
    """FinalPatchExpandX4V2 output identical with the kernel on and off."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (
        FinalPatchExpandX4V2,
    )

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16), jnp.float32)
    m_off = FinalPatchExpandX4V2(dim=16, gelu_tanh=True, fused_head=False)
    m_on = FinalPatchExpandX4V2(dim=16, gelu_tanh=True, fused_head=True)
    params = m_off.init(jax.random.PRNGKey(3), x)
    y_off = m_off.apply(params, x)
    y_on = m_on.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_on), np.asarray(y_off), atol=1e-5)
