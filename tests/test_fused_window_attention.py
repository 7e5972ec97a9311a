"""Fused Pallas shifted-window attention vs the XLA reference path.

Runs the kernel in the Pallas interpreter on CPU and asserts forward and
VJP parity against ``ops.window_attention.shifted_window_attention``
(the torchvision-semantics oracle-tested path), including shifted
blocks, padded (non-multiple-of-window) grids, and the bias-table
gradient accumulated across the whole grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (
    fused_window_attention as fwa,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.ops.window_attention import (
    shifted_window_attention,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fwa, "INTERPRET", True)


def _make_inputs(key, b, h, w, c, heads, window):
    ks = jax.random.split(key, 6)
    wh, ww = window
    table = (2 * wh - 1) * (2 * ww - 1)
    return dict(
        x=jax.random.normal(ks[0], (b, h, w, c)) * 0.5,
        qkv_kernel=jax.random.normal(ks[1], (c, 3 * c)) * 0.1,
        qkv_bias=jax.random.normal(ks[2], (3 * c,)) * 0.1,
        proj_kernel=jax.random.normal(ks[3], (c, c)) * 0.1,
        proj_bias=jax.random.normal(ks[4], (c,)) * 0.1,
        bias_table=jax.random.normal(ks[5], (table, heads)) * 0.1,
    )


CASES = [
    # (H, W, C, heads, window, shift) — divisible and padded grids
    (14, 14, 16, 2, (7, 7), (0, 0)),
    (14, 14, 16, 2, (7, 7), (3, 3)),
    (16, 16, 16, 2, (7, 7), (0, 0)),   # pad 16 -> 21
    (16, 16, 16, 2, (7, 7), (3, 3)),   # pad + shift masks
    (10, 12, 24, 3, (5, 5), (2, 2)),   # asymmetric + window 5
    (7, 7, 16, 2, (7, 7), (3, 3)),     # single window: shift dropped
    (7, 77, 16, 2, (7, 7), (3, 0)),    # 11-window image (two groups [10,1])
    (28, 98, 16, 2, (7, 7), (3, 3)),   # multi-strip grid
    (14, 147, 16, 2, (7, 7), (0, 3)),  # chunked mode (21 windows/strip)
]


@pytest.mark.parametrize("h,w,c,heads,window,shift", CASES)
def test_forward_matches_xla_path(h, w, c, heads, window, shift):
    inp = _make_inputs(jax.random.PRNGKey(0), 2, h, w, c, heads, window)
    kw = dict(window_size=window, shift_size=shift, num_heads=heads)
    want = shifted_window_attention(
        inp["x"], inp["qkv_kernel"], inp["qkv_bias"], inp["proj_kernel"],
        inp["proj_bias"], inp["bias_table"], **kw)
    got = fwa.fused_shifted_window_attention(
        inp["x"], inp["qkv_kernel"], inp["qkv_bias"], inp["proj_kernel"],
        inp["proj_bias"], inp["bias_table"], **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,h,w,c,heads,window,shift", [
    (2, 14, 14, 16, 2, (7, 7), (3, 3)),   # strip mode, bp=2 packed
    (2, 16, 16, 16, 2, (7, 7), (3, 3)),   # packed, padded grid
    (4, 14, 14, 16, 2, (7, 7), (3, 3)),   # bp=4 batch packing
    (3, 16, 16, 16, 2, (7, 7), (3, 3)),   # odd batch -> bp=1
    (2, 28, 98, 16, 2, (7, 7), (3, 3)),   # multi-strip grid
    (2, 14, 147, 16, 2, (7, 7), (0, 3)),  # chunked mode
])
def test_vjp_matches_xla_path(b, h, w, c, heads, window, shift):
    inp = _make_inputs(jax.random.PRNGKey(1), b, h, w, c, heads, window)
    kw = dict(window_size=window, shift_size=shift, num_heads=heads)

    def loss(fn, p):
        out = fn(p["x"], p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"],
                 p["proj_bias"], p["bias_table"], **kw)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(lambda p: loss(shifted_window_attention, p))(inp)
    g_fus = jax.grad(
        lambda p: loss(fwa.fused_shifted_window_attention, p))(inp)
    for key in inp:
        np.testing.assert_allclose(
            np.asarray(g_fus[key]), np.asarray(g_ref[key]),
            atol=3e-5, rtol=3e-5, err_msg=key)


def test_model_flag_routes_to_fused_kernel(monkeypatch):
    """``use_pallas=True`` (TPU.USE_PALLAS_ATTENTION) hits the kernel."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet

    calls = {"n": 0}
    real = fwa._fwd_pallas

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(fwa, "_fwd_pallas", counting)
    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(1, 1, 1, 1), window_size=4, use_pallas=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    model.apply(params, x, True)
    assert calls["n"] > 0


def test_supported_gates():
    assert fwa.supported((2, 14, 14, 16), (7, 7), 2)
    # dropout active -> XLA path
    assert not fwa.supported((2, 14, 14, 16), (7, 7), 2,
                             attention_dropout=0.1, deterministic=False)
    # head_dim not sliceable
    assert not fwa.supported((2, 14, 14, 18), (7, 7), 2)


def test_pick_bp_is_dtype_aware():
    """f32 inputs must pack fewer images than bf16 (scoped-vmem bound).

    Regression: a dtype-blind scratch estimate let bp=2 through for f32
    models and the 512² stage-1 strip overflowed the 16 MB scoped-vmem
    stack on hardware (18.92 MB measured, 2026-08-20) — hit by any f32
    model with the kernel on (e.g. tools/parity_vs_deploy's deploy arm).
    Shape below is that strip: batch 4, heads 8, 10-window row, C=256.
    """
    bf16 = fwa._pick_bp(4, 8, 10, 49, 768, dt=2)
    f32 = fwa._pick_bp(4, 8, 10, 49, 768, dt=4)
    assert bf16 == 2
    assert f32 == 1
    # the estimate itself scales with itemsize
    assert (fwa._pack_scratch_bytes(2, 10, 49, 768, dt=4)
            > fwa._PACK_SCRATCH_CAP)
    assert (fwa._pack_scratch_bytes(2, 10, 49, 768, dt=2)
            <= fwa._PACK_SCRATCH_CAP)


def test_fwd_pallas_packs_by_input_dtype(monkeypatch):
    """The real input itemsize reaches _grid_and_specs through the op.

    Captures the ``dt`` kwarg while running the public entry point with
    f32 and bf16 inputs, so a regression hardcoding ``dt`` in
    ``_fwd_pallas``/``_bwd_pallas`` fails here.
    """
    seen = []
    real = fwa._grid_and_specs

    def spy(*args, **kwargs):
        seen.append((kwargs.get("dt", 2), kwargs.get("bwd", False)))
        return real(*args, **kwargs)

    monkeypatch.setattr(fwa, "_grid_and_specs", spy)
    kw = dict(window_size=(7, 7), shift_size=(3, 3), num_heads=2)

    def run(dtype):
        inp = _make_inputs(jax.random.PRNGKey(2), 2, 14, 14, 16, 2, (7, 7))
        inp = {k: v.astype(dtype) for k, v in inp.items()}
        g = jax.grad(lambda x: jnp.sum(fwa.fused_shifted_window_attention(
            x, inp["qkv_kernel"], inp["qkv_bias"], inp["proj_kernel"],
            inp["proj_bias"], inp["bias_table"], **kw)))(inp["x"])
        jax.block_until_ready(g)

    run(jnp.float32)
    f32_calls = list(seen)
    seen.clear()
    run(jnp.bfloat16)
    bf16_calls = list(seen)
    # both fwd (bwd=False) and bwd (bwd=True) paths report the itemsize
    assert (4, False) in f32_calls and (4, True) in f32_calls
    assert (2, False) in bf16_calls and (2, True) in bf16_calls


def test_bwd_pack_bounds():
    """Backward packing (env-gated, default off — measured in-step
    negative, BASELINE.md r5) stays inside its scoped-vmem bound.

    The 512² stage-2 strip (batch 8, heads 16, 5-window rows, C=512)
    may pack bp=2 in bf16; the wider stage-1 strip and every f32 shape
    must stay unpacked (wm+dwm+dcw scratch exceeds the cap).
    """
    assert fwa._pick_bp(8, 16, 5, 49, 1536, dt=2, bwd=True) == 2
    assert fwa._pick_bp(8, 8, 10, 49, 768, dt=2, bwd=True) == 1
    assert fwa._pick_bp(8, 8, 10, 49, 768, dt=4, bwd=True) == 1
    # the backward estimate is the larger one (extra f32/dual scratch)
    assert (fwa._pack_scratch_bytes(2, 10, 49, 768, dt=2, bwd=True)
            > fwa._pack_scratch_bytes(2, 10, 49, 768, dt=2, bwd=False))
