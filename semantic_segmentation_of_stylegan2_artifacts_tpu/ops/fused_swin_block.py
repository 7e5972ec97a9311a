"""Fully fused Swin block (Pallas TPU kernel): one program per strip runs
``LN1 -> qkv -> window attention -> proj -> +sd·res -> LN2 -> MLP -> +sd·res``.

Why: with attention (``ops/fused_window_attention.py``) and the MLP
sublayer (``ops/fused_mlp.py``) each fused separately, the train step
still round-trips HBM between them — LN1 out, qkv (3C wide), attention
context, proj out, the residual stream and both sublayers' cotangents
all materialize per block, and each Pallas launch pays its own
per-program fixed cost (the r3 breakdown: stage 0 runs 13.1 ms/block
against a ~1 ms MXU floor; stage 2's 18 blocks were the top step item).
This kernel executes the ENTIRE torchvision-contract Swin block
(reference ``network/model_parts.py:110-176`` SwinTransformerBlock) for
one window-row strip in one program:

* the only HBM tensors per block are the input ``x`` strip, the output
  strip, and a saved attention-context strip (see backward below) —
  LN outputs, qkv, the 4C MLP hidden, probs and every cotangent of
  those stay in VMEM;
* all weights (qkv C×3C, proj C×C, fc1 C×4C, fc2 4C×C, LN/bias params)
  ride as constant-index blocks, VMEM-resident across the grid — hence
  the ``C <= 512`` gate (the C=1024 stages run ~7 ms of the 512² step
  and stay on the per-op kernels);
* the attention middle reuses the exact group/head-loop structure of
  ``fused_window_attention`` (block-diagonal packed MXU matmuls,
  ≤ ``_S_CAP`` packed tokens per score matmul, f32 softmax);
* stochastic depth stays INSIDE the residual chain: per-sample factors
  (``noise/keep``, drawn by the caller so the RNG stream matches the
  XLA path) enter as SMEM scalars — torchvision row-mode semantics;
* backward is flash-style and SPLIT INTO TWO PROGRAMS: saved are
  ``x``, the attention context and the post-attention residual ``x2``;
  an MLP-half program (LN2/fc1/GELU recomputed; emits ``dx2`` and the
  fc1/fc2/LN2 gradients) runs first, then an attention-half program
  (LN1/qkv/probs recomputed; emits ``dx`` and the qkv/proj/LN1/
  bias-table gradients).  A single monolithic backward CANNOT exist at
  C=512: its resident f32 gradient accumulators alone (qkv 3 MB +
  proj 1 MB + fc1 4 MB + fc2 4 MB) plus 6 MB of bf16 weights exceed
  the 16 MB VMEM scoped limit (measured on v5e, r4: 17.54 MB request
  rejected).  Each half stays ~11-15 MB; weight/LN/bias-table
  gradients are accumulated across the sequential TPU grid into
  constant-index f32 output blocks (same pattern as the bias-table
  gradient in ``fused_window_attention._bwd_kernel``).  The extra HBM
  cost vs the impossible monolith is one C-wide stream saved forward
  (``x2``) and one round-tripped between the halves (``dx2``).

Numerics match the XLA path (``models/layers.py::SwinBlock`` with
kernels off) to bf16 rounding; padded tokens reproduce torchvision's
zero-padded-normed-map semantics via the real-token row mask.  Asserted
in ``tests/test_fused_swin_block.py`` (interpret mode).  Gated by
``TPU.FUSED_BLOCK`` + backend/shape support.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _ln_normed, _mm
from .fused_window_attention import (
    _MAX_BODY_WINDOWS,
    _S_CAP,
    _group_sizes,
    _softmax_rows,
    _tile_to_wm,
)
from .window_attention import relative_position_index, shifted_window_mask

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

# widest channel dim whose five weight matrices (and their f32 gradient
# accumulators in the backward) stay VMEM-resident for the whole grid.
# SSA_FUSED_BLOCK_DIM_CAP lowers it per-run (hardware triage: enable the
# kernel stage-by-stage if a wide-head backward hits the compile cap).
_DIM_CAP = 512


def _dim_cap() -> int:
    import os

    try:
        return min(_DIM_CAP, int(os.environ.get("SSA_FUSED_BLOCK_DIM_CAP",
                                                _DIM_CAP)))
    except ValueError:  # pragma: no cover
        return _DIM_CAP


def _ln_bwd(dn, xhat, rsig, scale):
    """flax LayerNorm VJP (f32): input cotangent from normed cotangent."""
    dxh = dn * scale
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return (dxh - m1 - xhat * m2) * rsig


def _wm_to_tile(wm_ref, o_ref, wh: int, ww: int, c: int):
    """Window-major rows of ``wm_ref`` -> spatial strip ``o_ref[0]``."""
    n = wh * ww
    nww = o_ref.shape[2] // ww
    for w in range(nww):
        o_ref[0, :, w * ww:(w + 1) * ww, :] = (
            wm_ref[w * n:(w + 1) * n, :c].reshape(wh, ww, c)
        )


def _attn_middle_fwd(wm_ref, s_ref, p_ref, z_ref, ow_ref, bias_ref, mall,
                     *, n: int, c: int, heads: int, nww: int):
    """Forward attention middle on window-major qkv (one strip, bp=1).

    Same group/head-loop structure as ``fused_window_attention``'s
    ``_fwd_kernel`` — block-diagonal packed score/context matmuls.
    """
    hd = c // heads
    scale = hd ** -0.5
    w0 = 0
    for g in _group_sizes(nww, n):
        s = g * n
        for h in range(heads):
            q = wm_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]
            k = wm_ref[w0 * n:w0 * n + s, c + h * hd:c + (h + 1) * hd]
            v = wm_ref[w0 * n:w0 * n + s, 2 * c + h * hd:2 * c + (h + 1) * hd]
            s_ref[:s, :s] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for w in range(g):
                p_ref[w * n:(w + 1) * n, :] = (
                    s_ref[w * n:(w + 1) * n, w * n:(w + 1) * n]
                )
            blk = p_ref[:s, :] * scale
            blk += jnp.broadcast_to(bias_ref[h][None], (g, n, n)).reshape(s, n)
            blk += mall[w0:w0 + g].reshape(s, n)
            probs = _softmax_rows(blk).astype(z_ref.dtype)
            for w in range(g):
                z_ref[w * n:(w + 1) * n, w * n:(w + 1) * n] = (
                    probs[w * n:(w + 1) * n, :]
                )
            ctx = jax.lax.dot_general(
                z_ref[:s, :s], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ow_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd] = (
                ctx.astype(ow_ref.dtype)
            )
        w0 += g


def _attn_middle_bwd(wm_ref, dcw_ref, dwm_ref, s_ref, p_ref, dp_ref, z_ref,
                     z2_ref, bias_ref, dbias_ref, mall,
                     *, n: int, c: int, heads: int, nww: int):
    """Backward attention middle: recompute probs from ``wm_ref`` (saved
    qkv relayout), produce window-major dqkv in ``dwm_ref`` and
    accumulate the bias-table gradient."""
    hd = c // heads
    scale = hd ** -0.5
    w0 = 0
    for g in _group_sizes(nww, n):
        s = g * n
        for h in range(heads):
            q = wm_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]
            k = wm_ref[w0 * n:w0 * n + s, c + h * hd:c + (h + 1) * hd]
            v = wm_ref[w0 * n:w0 * n + s, 2 * c + h * hd:2 * c + (h + 1) * hd]
            dctx = dcw_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]

            s_ref[:s, :s] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for w in range(g):
                p_ref[w * n:(w + 1) * n, :] = (
                    s_ref[w * n:(w + 1) * n, w * n:(w + 1) * n]
                )
            blk = p_ref[:s, :] * scale
            blk += jnp.broadcast_to(bias_ref[h][None], (g, n, n)).reshape(s, n)
            blk += mall[w0:w0 + g].reshape(s, n)
            probs = _softmax_rows(blk)
            pz = probs.astype(z_ref.dtype)
            for w in range(g):
                z_ref[w * n:(w + 1) * n, w * n:(w + 1) * n] = (
                    pz[w * n:(w + 1) * n, :]
                )

            s_ref[:s, :s] = jax.lax.dot_general(
                dctx, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for w in range(g):
                dp_ref[w * n:(w + 1) * n, :] = (
                    s_ref[w * n:(w + 1) * n, w * n:(w + 1) * n]
                )
            dpb = dp_ref[:s, :]
            ds = probs * (
                dpb - jnp.sum(dpb * probs, axis=-1, keepdims=True)
            )
            dbias_ref[h] += jnp.sum(ds.reshape(g, n, n), axis=0)
            dsz = ds.astype(z2_ref.dtype)
            for w in range(g):
                z2_ref[w * n:(w + 1) * n, w * n:(w + 1) * n] = (
                    dsz[w * n:(w + 1) * n, :]
                )

            dq = jax.lax.dot_general(
                z2_ref[:s, :s], k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                z2_ref[:s, :s], q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dv = jax.lax.dot_general(
                z_ref[:s, :s], dctx, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwm_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd] = (
                dq.astype(dwm_ref.dtype))
            dwm_ref[w0 * n:w0 * n + s, c + h * hd:c + (h + 1) * hd] = (
                dk.astype(dwm_ref.dtype))
            dwm_ref[w0 * n:w0 * n + s,
                    2 * c + h * hd:2 * c + (h + 1) * hd] = (
                dv.astype(dwm_ref.dtype))
        w0 += g


def _real_rows(wh, wp, h, w, sh, sw, hp):
    """In-kernel ``(wh*wp, 1)`` f32 real-token mask for this strip.

    Token (r, col) of strip ``program_id(1)`` sits at rolled row
    ``i = pid*wh + r``; it is real iff the unrolled position is inside
    the (h, w) map: ``(i+sh) % hp < h and (col+sw) % wp < w``.  Built
    from a sublane iota instead of riding in as an array: the former
    ``(1, wh, Wp) -> (wh*Wp, 1)`` ref reshape collapses the lane dim
    into sublanes, which Mosaic's infer-vector-layout rejects
    (``tpu.reshape (1x7x133) -> (931x1)``, r4 hardware triage)."""
    t = wh * wp
    idx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    r = idx // wp
    col = idx - r * wp
    oi = jax.lax.rem(pl.program_id(1) * wh + r + sh, hp)
    oj = jax.lax.rem(col + sw, wp)
    return jnp.logical_and(oi < h, oj < w).astype(jnp.float32)


def _fwd_kernel(
    x_ref,      # (1, wh, Wp, C)
    bias_ref,   # (heads, N, N) f32
    mask_ref,   # (1, nWw, N, N) f32 additive
    sd1_ref,    # (1, 1) f32 SMEM: stochastic-depth factor, attn residual
    sd2_ref,    # (1, 1) f32 SMEM: mlp residual
    ln1s_ref, ln1b_ref,          # (1, C) f32
    qkvk_ref, qkvb_ref,          # (C, 3C), (1, 3C)
    projk_ref, projb_ref,        # (C, C), (1, C)
    ln2s_ref, ln2b_ref,          # (1, C) f32
    w1_ref, b1_ref,              # (C, H), (1, H)
    w2_ref, b2_ref,              # (H, C), (1, C)
    o_ref,      # (1, wh, Wp, C)
    ctx_ref,    # (1, wh, Wp, C) — saved for the backward
    x2_ref,     # (1, wh, Wp, C) — post-attention residual, saved
    wm_ref,     # scratch (nWw*N, 3C)
    s_ref,      # scratch (S_cap, S_cap) f32
    p_ref,      # scratch (S_cap, N) f32
    z_ref,      # scratch (S_cap, S_cap) dtype
    ow_ref,     # scratch (nWw*N, C) dtype
    *,
    wh: int,
    ww: int,
    heads: int,
    gelu_tanh: bool,
    dims: Tuple[int, int, int, int, int],
):
    n = wh * ww
    wp = x_ref.shape[2]
    c = x_ref.shape[3]
    nww = wp // ww
    t = wh * wp
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        z_ref[...] = jnp.zeros_like(z_ref)

    x2d = x_ref[0].reshape(t, c)
    h, w, sh, sw, hp = dims
    rm = _real_rows(wh, wp, h, w, sh, sw, hp)

    # LN1 + qkv; zero normed pad rows (torchvision pads the normed map)
    n1, _, _ = _ln_normed(x2d, ln1s_ref[0][None], ln1b_ref[0][None])
    n1 = n1 * rm.astype(n1.dtype)
    qkv2d = _mm(n1, qkvk_ref[...], (((1,), (0,))), n1.dtype) \
        + qkvb_ref[0][None]
    _tile_to_wm(qkv2d.reshape(wh, wp, 3 * c), wm_ref, wh, ww, 3 * c)

    _attn_middle_fwd(wm_ref, s_ref, p_ref, z_ref, ow_ref, bias_ref,
                     mask_ref[0], n=n, c=c, heads=heads, nww=nww)
    _wm_to_tile(ow_ref, ctx_ref, wh, ww, c)
    ctx2d = ctx_ref[0].reshape(t, c)

    # proj + attn residual (per-sample stochastic depth)
    y1 = _mm(ctx2d, projk_ref[...], (((1,), (0,))), n1.dtype) \
        + projb_ref[0][None]
    x2 = x2d + y1 * sd1_ref[0, 0, 0].astype(y1.dtype)
    x2_ref[0] = x2.reshape(wh, wp, c)

    # LN2 + MLP + residual
    n2, _, _ = _ln_normed(x2, ln2s_ref[0][None], ln2b_ref[0][None])
    z1 = _mm(n2, w1_ref[...], (((1,), (0,))), n2.dtype) + b1_ref[0][None]
    h = jax.nn.gelu(z1, approximate=gelu_tanh)
    y2 = _mm(h, w2_ref[...], (((1,), (0,))), n2.dtype) + b2_ref[0][None]
    out = x2 + y2 * sd2_ref[0, 0, 0].astype(y2.dtype)
    o_ref[0] = out.reshape(wh, wp, c)


def _bwd_mlp_kernel(
    x2_ref,     # (1, wh, Wp, C) saved post-attention residual
    dy_ref,     # (1, wh, Wp, C)
    sd2_ref,    # (1, 1, 1) f32 SMEM
    ln2s_ref, ln2b_ref,          # (1, C) f32
    w1_ref, b1_ref,              # (C, H), (1, H)
    w2_ref, b2_ref,              # (H, C), (1, C)
    dx2_ref,    # (1, wh, Wp, C) — dy passthrough + LN2 VJP
    dln2s_ref, dln2b_ref,        # (1, C) f32 — accumulated across grid
    dw1_ref, db1_ref,            # (C, H), (1, H) f32
    dw2_ref, db2_ref,            # (H, C), (1, C) f32
    *,
    wh: int,
    gelu_tanh: bool,
):
    wp = x2_ref.shape[2]
    c = x2_ref.shape[3]
    t = wh * wp
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    x2 = x2_ref[0].reshape(t, c)
    dy = dy_ref[0].reshape(t, c)
    sd2 = sd2_ref[0, 0, 0]

    # recompute LN2/fc1/GELU (flash-style; saved: x2)
    n2, xhat2, rsig2 = _ln_normed(x2, ln2s_ref[0][None], ln2b_ref[0][None])
    z1 = _mm(n2, w1_ref[...], (((1,), (0,))), n2.dtype) + b1_ref[0][None]
    gelu = lambda z: jax.nn.gelu(z, approximate=gelu_tanh)  # noqa: E731
    h, gelu_vjp = jax.vjp(gelu, z1)

    dy2 = dy * sd2.astype(dy.dtype)
    db2_ref[...] += jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)
    dw2_ref[...] += _mm(h, dy2, (((0,), (0,))))
    dh = _mm(dy2, w2_ref[...], (((1,), (1,))), h.dtype)
    dz1 = gelu_vjp(dh)[0]
    db1_ref[...] += jnp.sum(dz1.astype(jnp.float32), axis=0, keepdims=True)
    dw1_ref[...] += _mm(n2, dz1, (((0,), (0,))))
    dn2 = _mm(dz1, w1_ref[...], (((1,), (1,))), n2.dtype).astype(jnp.float32)
    dln2s_ref[...] += jnp.sum(dn2 * xhat2, axis=0, keepdims=True)
    dln2b_ref[...] += jnp.sum(dn2, axis=0, keepdims=True)
    dx2 = dy + _ln_bwd(dn2, xhat2, rsig2, ln2s_ref[0][None]).astype(dy.dtype)
    dx2_ref[0] = dx2.reshape(wh, wp, c)


def _bwd_attn_kernel(
    x_ref,      # (1, wh, Wp, C)
    ctx_ref,    # (1, wh, Wp, C) saved attention context
    dx2_ref,    # (1, wh, Wp, C) cotangent from the MLP-half program
    bias_ref,   # (heads, N, N) f32
    mask_ref,   # (1, nWw, N, N) f32
    sd1_ref,    # (1, 1, 1) f32 SMEM
    ln1s_ref, ln1b_ref,
    qkvk_ref, qkvb_ref,
    projk_ref, projb_ref,
    dx_ref,     # (1, wh, Wp, C)
    dbias_ref,  # (heads, N, N) f32 — accumulated across the grid
    dln1s_ref, dln1b_ref,        # (1, C) f32 — accumulated
    dqkvk_ref, dqkvb_ref,        # (C, 3C), (1, 3C) f32
    dprojk_ref, dprojb_ref,      # (C, C), (1, C) f32
    wm_ref,     # scratch (nWw*N, 3C)
    dcw_ref,    # scratch (nWw*N, C)
    dwm_ref,    # scratch (nWw*N, 3C)
    dq_ref,     # scratch (1, wh, Wp, 3C) — dqkv back in token order
    s_ref,      # scratch (S_cap, S_cap) f32
    p_ref,      # scratch (S_cap, N) f32
    dp_ref,     # scratch (S_cap, N) f32
    z_ref,      # scratch (S_cap, S_cap) dtype
    z2_ref,     # scratch (S_cap, S_cap) dtype
    *,
    wh: int,
    ww: int,
    heads: int,
    dims: Tuple[int, int, int, int, int],
):
    n = wh * ww
    wp = x_ref.shape[2]
    c = x_ref.shape[3]
    nww = wp // ww
    t = wh * wp
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        z_ref[...] = jnp.zeros_like(z_ref)
        z2_ref[...] = jnp.zeros_like(z2_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for r in (dln1s_ref, dln1b_ref, dqkvk_ref, dqkvb_ref, dprojk_ref,
                  dprojb_ref):
            r[...] = jnp.zeros_like(r)

    x2d = x_ref[0].reshape(t, c)
    ctx2d = ctx_ref[0].reshape(t, c)
    dx2 = dx2_ref[0].reshape(t, c)
    h, w, sh, sw, hp = dims
    rm = _real_rows(wh, wp, h, w, sh, sw, hp)
    sd1 = sd1_ref[0, 0, 0]

    # ---- recompute LN1 + qkv (flash-style; saved: x, ctx) ----
    n1, xhat1, rsig1 = _ln_normed(x2d, ln1s_ref[0][None], ln1b_ref[0][None])
    n1 = n1 * rm.astype(n1.dtype)
    qkv2d = _mm(n1, qkvk_ref[...], (((1,), (0,))), n1.dtype) \
        + qkvb_ref[0][None]
    _tile_to_wm(qkv2d.reshape(wh, wp, 3 * c), wm_ref, wh, ww, 3 * c)

    # ---- proj backward ----
    dy1 = dx2 * sd1.astype(dx2.dtype)
    dprojb_ref[...] += jnp.sum(dy1.astype(jnp.float32), axis=0, keepdims=True)
    dprojk_ref[...] += _mm(ctx2d, dy1, (((0,), (0,))))
    dctx = _mm(dy1, projk_ref[...], (((1,), (1,))), dy1.dtype)
    _tile_to_wm(dctx.reshape(wh, wp, c), dcw_ref, wh, ww, c)

    # ---- attention middle backward (recomputes probs from wm) ----
    _attn_middle_bwd(wm_ref, dcw_ref, dwm_ref, s_ref, p_ref, dp_ref, z_ref,
                     z2_ref, bias_ref, dbias_ref, mask_ref[0],
                     n=n, c=c, heads=heads, nww=nww)
    _wm_to_tile(dwm_ref, dq_ref, wh, ww, 3 * c)
    dqkv = dq_ref[0].reshape(t, 3 * c)

    # ---- qkv + LN1 backward ----
    dqkvb_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dqkvk_ref[...] += _mm(n1, dqkv, (((0,), (0,))))
    dn1 = _mm(dqkv, qkvk_ref[...], (((1,), (1,))), n1.dtype)
    dn1 = (dn1 * rm.astype(dn1.dtype)).astype(jnp.float32)
    dln1s_ref[...] += jnp.sum(dn1 * xhat1, axis=0, keepdims=True)
    dln1b_ref[...] += jnp.sum(dn1, axis=0, keepdims=True)
    dx = dx2 + _ln_bwd(dn1, xhat1, rsig1, ln1s_ref[0][None]).astype(dx2.dtype)
    dx_ref[0] = dx.reshape(wh, wp, c)


def _const_spec(shape, ndim_grid=2):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)


def _param_specs(c, hid):
    f = _const_spec
    return [
        f((1, c)), f((1, c)),            # ln1 scale/bias
        f((c, 3 * c)), f((1, 3 * c)),    # qkv
        f((c, c)), f((1, c)),            # proj
        f((1, c)), f((1, c)),            # ln2
        f((c, hid)), f((1, hid)),        # fc1
        f((hid, c)), f((1, c)),          # fc2
    ]


def _fwd_pallas(x, rel_bias, mask, sd1, sd2, params, *, wh, ww, heads,
                gelu_tanh, dims, save_ctx):
    """``save_ctx=False`` (inference / primal-only): the attention context
    and the post-attention residual live in VMEM scratch instead of HBM
    outputs — kernel arg order is unchanged because Pallas passes
    ``ins, outs, scratch`` and (ctx, x2) are either outputs 2-3 or the
    first two scratch refs."""
    b, hp, wp, c = x.shape
    n = wh * ww
    nwh, nww = hp // wh, wp // ww
    hid = params[8].shape[1]
    s_all = nww * n
    s_cap = min(nww, max(1, _S_CAP // n)) * n
    grid = (b, nwh)
    # (B,1,1)/(1,1,1): trailing block dims must equal the array dims
    # (a (1,1) block of a (B,1) array violates the Mosaic sublane rule)
    sd_spec = pl.BlockSpec((1, 1, 1), lambda b_, i: (b_, 0, 0),
                           memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((1, wh, wp, c), lambda b_, i: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((heads, n, n)),
        pl.BlockSpec((1, nww, n, n), lambda b_, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        sd_spec, sd_spec,
    ] + _param_specs(c, hid)
    out_spec = pl.BlockSpec((1, wh, wp, c), lambda b_, i: (b_, i, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((s_all, 3 * c), x.dtype),
        pltpu.VMEM((s_cap, s_cap), jnp.float32),
        pltpu.VMEM((s_cap, n), jnp.float32),
        pltpu.VMEM((s_cap, s_cap), x.dtype),
        pltpu.VMEM((s_all, c), x.dtype),
    ]
    if save_ctx:
        out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype),) * 3
        out_specs = (out_spec, out_spec, out_spec)
    else:
        out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
        out_specs = out_spec
        scratch = [pltpu.VMEM((1, wh, wp, c), x.dtype)] * 2 + scratch
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, wh=wh, ww=ww, heads=heads,
                          gelu_tanh=gelu_tanh, dims=dims),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=INTERPRET,
    )(x, rel_bias, mask, sd1[:, None, None], sd2[:, None, None], *params)
    return res if save_ctx else (res, None, None)


def _bwd_pallas(x, ctx, x2, dy, rel_bias, mask, sd1, sd2, params, *, wh,
                ww, heads, gelu_tanh, dims):
    """Two-program backward (see module docstring): the MLP half first
    (emits ``dx2`` + fc/LN2 grads), then the attention half (emits
    ``dx`` + qkv/proj/LN1/bias grads).  Returns grads in the same order
    the old monolithic kernel did."""
    b, hp, wp, c = x.shape
    n = wh * ww
    nwh, nww = hp // wh, wp // ww
    hid = params[8].shape[1]
    s_all = nww * n
    s_cap = min(nww, max(1, _S_CAP // n)) * n
    grid = (b, nwh)
    f32 = jnp.float32
    # (B,1,1)/(1,1,1): trailing block dims must equal the array dims
    # (a (1,1) block of a (B,1) array violates the Mosaic sublane rule)
    sd_spec = pl.BlockSpec((1, 1, 1), lambda b_, i: (b_, 0, 0),
                           memory_space=pltpu.SMEM)
    strip = pl.BlockSpec((1, wh, wp, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM)

    # ---- MLP half: (x2, dy) -> dx2 + LN2/fc1/fc2 grads ----
    mlp_out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),           # dx2
        jax.ShapeDtypeStruct((1, c), f32),                # dln2s
        jax.ShapeDtypeStruct((1, c), f32),                # dln2b
        jax.ShapeDtypeStruct((c, hid), f32),              # dw1
        jax.ShapeDtypeStruct((1, hid), f32),              # db1
        jax.ShapeDtypeStruct((hid, c), f32),              # dw2
        jax.ShapeDtypeStruct((1, c), f32),                # db2
    )
    ps = _param_specs(c, hid)
    mlp_outs = pl.pallas_call(
        functools.partial(_bwd_mlp_kernel, wh=wh, gelu_tanh=gelu_tanh),
        out_shape=mlp_out_shapes,
        grid=grid,
        in_specs=[strip, strip, sd_spec] + ps[6:12],
        out_specs=(strip,) + tuple(
            _const_spec(s.shape) for s in mlp_out_shapes[1:]
        ),
        interpret=INTERPRET,
    )(x2, dy, sd2[:, None, None], *params[6:12])
    dx2, dln2s, dln2b, dw1, db1, dw2, db2 = mlp_outs

    # ---- attention half: (x, ctx, dx2) -> dx + LN1/qkv/proj/bias grads
    attn_out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),           # dx
        jax.ShapeDtypeStruct((heads, n, n), f32),         # dbias
        jax.ShapeDtypeStruct((1, c), f32),                # dln1s
        jax.ShapeDtypeStruct((1, c), f32),                # dln1b
        jax.ShapeDtypeStruct((c, 3 * c), f32),            # dqkvk
        jax.ShapeDtypeStruct((1, 3 * c), f32),            # dqkvb
        jax.ShapeDtypeStruct((c, c), f32),                # dprojk
        jax.ShapeDtypeStruct((1, c), f32),                # dprojb
    )
    attn_outs = pl.pallas_call(
        functools.partial(_bwd_attn_kernel, wh=wh, ww=ww, heads=heads,
                          dims=dims),
        out_shape=attn_out_shapes,
        grid=grid,
        in_specs=[
            strip, strip, strip,
            _const_spec((heads, n, n)),
            pl.BlockSpec((1, nww, n, n), lambda b_, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            sd_spec,
        ] + ps[0:6],
        out_specs=(strip, _const_spec((heads, n, n))) + tuple(
            _const_spec(s.shape) for s in attn_out_shapes[2:]
        ),
        scratch_shapes=[
            pltpu.VMEM((s_all, 3 * c), x.dtype),
            pltpu.VMEM((s_all, c), x.dtype),
            pltpu.VMEM((s_all, 3 * c), x.dtype),
            pltpu.VMEM((1, wh, wp, 3 * c), x.dtype),
            pltpu.VMEM((s_cap, s_cap), f32),
            pltpu.VMEM((s_cap, n), f32),
            pltpu.VMEM((s_cap, n), f32),
            pltpu.VMEM((s_cap, s_cap), x.dtype),
            pltpu.VMEM((s_cap, s_cap), x.dtype),
        ],
        interpret=INTERPRET,
    )(x, ctx, dx2, rel_bias, mask, sd1[:, None, None], *params[0:6])
    (dx, dbias, dln1s, dln1b, dqkvk, dqkvb, dprojk, dprojb) = attn_outs
    return (dx, dbias, dln1s, dln1b, dqkvk, dqkvb, dprojk, dprojb,
            dln2s, dln2b, dw1, db1, dw2, db2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _block_core(x, rel_bias, mask, sd1, sd2, params, wh, ww, heads,
                gelu_tanh, dims):
    """Whole Swin block on a rolled/padded map: ``(B,Hp,Wp,C)->same``.

    ``params`` order: ln1s, ln1b, qkvk, qkvb, projk, projb, ln2s, ln2b,
    w1, b1, w2, b2.  ``dims`` = static ``(h, w, sh, sw, hp)`` for the
    in-kernel real-token mask.  Under ``shard_map`` the replicated
    params' cotangents need no explicit collective: the shard_map
    transpose psums ``P()`` inputs' cotangents itself."""
    out, _, _ = _fwd_pallas(x, rel_bias, mask, sd1, sd2, params,
                            wh=wh, ww=ww, heads=heads, gelu_tanh=gelu_tanh,
                            dims=dims, save_ctx=False)
    return out


def _block_core_fwd(x, rel_bias, mask, sd1, sd2, params, wh, ww, heads,
                    gelu_tanh, dims):
    out, ctx, x2 = _fwd_pallas(x, rel_bias, mask, sd1, sd2, params,
                               wh=wh, ww=ww, heads=heads,
                               gelu_tanh=gelu_tanh, dims=dims,
                               save_ctx=True)
    return out, (x, ctx, x2, rel_bias, mask, sd1, sd2, params)


def _block_core_bwd(wh, ww, heads, gelu_tanh, dims, res, dy):
    x, ctx, x2, rel_bias, mask, sd1, sd2, params = res
    outs = _bwd_pallas(x, ctx, x2, dy, rel_bias, mask, sd1, sd2, params,
                       wh=wh, ww=ww, heads=heads, gelu_tanh=gelu_tanh,
                       dims=dims)
    dx, dbias = outs[0], outs[1]
    (dln1s, dln1b, dqkvk, dqkvb, dprojk, dprojb, dln2s, dln2b,
     dw1, db1, dw2, db2) = outs[2:]
    dparams = (dln1s, dln1b, dqkvk, dqkvb, dprojk, dprojb,
               dln2s, dln2b, dw1, db1, dw2, db2)
    dparams = tuple(g.astype(p.dtype).reshape(p.shape)
                    for g, p in zip(dparams, params))
    return (dx, dbias.astype(rel_bias.dtype),
            jnp.zeros_like(mask), jnp.zeros_like(sd1), jnp.zeros_like(sd2),
            dparams)


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


def supported(
    x_shape: Tuple[int, int, int, int],
    window_size: Tuple[int, int],
    num_heads: int,
    hidden_dim: int,
    *,
    dropout: float = 0.0,
    attention_dropout: float = 0.0,
    deterministic: bool = True,
) -> bool:
    """Kernel applicability for a ``(B,H,W,C)`` input."""
    if not deterministic and (dropout > 0.0 or attention_dropout > 0.0):
        return False  # in-sublayer dropout stays on the XLA path
    b, h, w, c = x_shape
    wh, ww = window_size
    n = wh * ww
    if c % num_heads or c % 8 or hidden_dim % 128:
        return False
    hd = c // num_heads
    if hd % 8 or hd > 128:
        return False
    if n > _S_CAP:
        return False
    cap = _dim_cap()
    if c > cap or hidden_dim > 4 * cap:
        return False  # weights must stay VMEM-resident
    if (w + (-w % ww)) // ww > _MAX_BODY_WINDOWS:
        return False  # wide strips: per-op kernels / XLA handle these
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_swin_block(
    x: jax.Array,
    ln1_scale: jax.Array,
    ln1_bias: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    bias_table: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: jax.Array,
    fc2_kernel: jax.Array,
    fc2_bias: jax.Array,
    sd1: jax.Array,
    sd2: jax.Array,
    *,
    window_size: Tuple[int, int],
    shift_size: Tuple[int, int],
    num_heads: int,
    gelu_tanh: bool = False,
    data_mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """One whole Swin block, fused: drop-in for the ``SwinBlock`` body
    (reference ``network/model_parts.py:110-176``).

    ``sd1``/``sd2``: per-sample stochastic-depth multipliers
    (``bernoulli/keep``; ones when deterministic), drawn by the caller so
    both code paths consume the module RNG stream identically.
    ``data_mesh``: when training data-parallel the kernel runs per-shard
    under ``shard_map`` over ``data_axis`` (Pallas custom calls are not
    auto-partitioned by GSPMD), batch axis leading.
    """
    b, h, w, c = x.shape
    wh, ww = window_size
    sh, sw = shift_size
    n = wh * ww

    pad_h, pad_w = -h % wh, -w % ww
    hp, wp = h + pad_h, w + pad_w
    if wh >= hp:
        sh = 0
    if ww >= wp:
        sw = 0
    shifted = (sh + sw) > 0

    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    if shifted:
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))

    nwh, nww = hp // wh, wp // ww
    # real-token mask is generated in-kernel from these static dims
    # (an (hp, wp) array input needed a lane->sublane reshape Mosaic
    # rejects; r4 hardware triage)
    dims = (h, w, sh if shifted else 0, sw if shifted else 0, hp)

    rel_idx = relative_position_index(wh, ww)
    rel_bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, num_heads)
    rel_bias = rel_bias.transpose(2, 0, 1).astype(jnp.float32)

    mask_np = np.zeros((nwh, nww, n, n), np.float32)
    if shifted:
        mask_np[:] = shifted_window_mask(
            hp, wp, wh, ww, sh, sw).reshape(nwh, nww, n, n)
    mask = jnp.asarray(mask_np)

    dt = x.dtype
    params = (
        ln1_scale.astype(jnp.float32)[None],
        ln1_bias.astype(jnp.float32)[None],
        qkv_kernel.astype(dt), qkv_bias.astype(dt)[None],
        proj_kernel.astype(dt), proj_bias.astype(dt)[None],
        ln2_scale.astype(jnp.float32)[None],
        ln2_bias.astype(jnp.float32)[None],
        fc1_kernel.astype(dt), fc1_bias.astype(dt)[None],
        fc2_kernel.astype(dt), fc2_bias.astype(dt)[None],
    )
    sd1 = sd1.astype(jnp.float32)
    sd2 = sd2.astype(jnp.float32)

    def run(xs, rb, mk, s1, s2, ps):
        return _block_core(xs, rb, mk, s1, s2, ps, wh, ww, num_heads,
                           gelu_tanh, dims)

    if data_mesh is not None and data_mesh.shape.get(data_axis, 1) > 1:
        from jax.sharding import PartitionSpec as P

        nsh = data_mesh.shape[data_axis]
        if x.shape[0] % nsh == 0:
            out = jax.shard_map(
                run,
                mesh=data_mesh,
                in_specs=(P(data_axis), P(), P(),
                          P(data_axis), P(data_axis), P()),
                out_specs=P(data_axis),
                check_vma=False,  # pallas outputs carry no vma annotation
            )(x, rel_bias, mask, sd1, sd2, params)
        else:
            out = run(x, rel_bias, mask, sd1, sd2, params)
    else:
        out = run(x, rel_bias, mask, sd1, sd2, params)

    if shifted:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    if pad_h or pad_w:
        out = out[:, :h, :w, :]
    return out
