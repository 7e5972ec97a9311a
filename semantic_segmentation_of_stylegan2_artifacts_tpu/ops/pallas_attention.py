"""Fused shifted-window attention (Pallas/Mosaic TPU kernel) — experimental.

One grid program per (batch, window-row strip): loads the strip, runs one
MXU matmul for qkv over all strip tokens, relayouts windows into a
56-row-stride scratch (sublane-aligned padding of the 49-token window),
loops windows with ``fori_loop`` doing per-head 49×49 attention with fp32
softmax in VMEM, concatenates heads, and finishes with one proj matmul.
Output is **window-major** ``(B, nW, 49, C)``; the cheap spatial reverse
happens in XLA.

Status (measured, v5e, stage-0 shape 8×133×133×128):
    XLA path 6.1 ms · this kernel 4.8 ms (1.27×) · compile ~3 min/shape.
Mosaic executes the small per-window ops poorly ((56,32) dots ≈ 3 µs,
(56,56) softmax ≈ 5 µs — vs XLA's ~0.5 µs per window-head), so the fusion
win is mostly cancelled; the kernel is kept OFF by default
(``TPU.USE_PALLAS_ATTENTION``) as the substrate for the round-2 rewrite.
Numerics are exact vs the XLA path (see tests/test_pallas_attention.py).

Differentiable via ``jax.custom_vjp``: backward reuses the XLA path's VJP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import window_attention as wa_ref
from .window_attention import relative_position_index, shifted_window_mask


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _strip_kernel(
    x_ref,       # (1, w, Wp, C) normed+shifted strip
    qkv_w_ref,   # (C, 3C)
    qkv_b_ref,   # (1, 3C)
    proj_w_ref,  # (C, C)
    proj_b_ref,  # (1, C)
    bias_ref,    # (heads, NP, NP) f32: rel-pos bias padded with -1e9 cols
    mask_ref,    # (nww, NP, NP) f32: shift mask (zeros when unshifted)
    o_ref,       # (1, nww, N, C) window-major output
    qs_ref,      # scratch (nww*NP, 3C) bf16/f32 window-major qkv
    ctx_ref,     # scratch (nww*NP, C) f32
    *,
    w: int,
    heads: int,
):
    _, _, wp, c = x_ref.shape
    n = w * w
    np_ = _round_up(n, 8)
    nww = wp // w
    hd = c // heads
    scale = hd ** -0.5

    x = x_ref[0].reshape(w * wp, c)
    qkv = jnp.dot(x, qkv_w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[0].astype(jnp.float32)).astype(x.dtype)
    q3 = qkv.reshape(w, wp, 3 * c)
    # window-major relayout with zero-filled pad rows (keeps logits finite)
    for j in range(nww):
        qs_ref[j * np_:j * np_ + n, :] = (
            q3[:, j * w:(j + 1) * w, :].reshape(n, 3 * c)
        )
        if np_ > n:
            qs_ref[j * np_ + n:(j + 1) * np_, :] = jnp.zeros(
                (np_ - n, 3 * c), qs_ref.dtype
            )

    def body(j, _):
        start = pl.multiple_of(j * np_, 8)
        win = qs_ref[pl.ds(start, np_), :]
        mj = mask_ref[j]
        ctxs = []
        for h in range(heads):
            q = win[:, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
            k = win[:, c + h * hd:c + (h + 1) * hd].astype(jnp.float32)
            v = win[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            lg = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lg = lg + bias_ref[h] + mj
            m = jnp.max(lg, axis=-1, keepdims=True)
            p = jnp.exp(lg - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctxs.append(
                jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            )
        ctx_ref[pl.ds(start, np_), :] = jnp.concatenate(ctxs, axis=1)
        return 0

    jax.lax.fori_loop(0, nww, body, 0)

    out = jnp.dot(ctx_ref[:].astype(x.dtype), proj_w_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + proj_b_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype).reshape(nww, np_, c)[:, 0:n, :]


def _fused_core(x_shifted, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                bias_pad, mask_pad, *, window: int, num_heads: int):
    b, hp, wp, c = x_shifted.shape
    w = window
    nwh, nww = hp // w, wp // w
    n = w * w
    np_ = _round_up(n, 8)
    dtype = x_shifted.dtype

    kernel = functools.partial(_strip_kernel, w=w, heads=num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(b, nwh),
        in_specs=[
            pl.BlockSpec((1, w, wp, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, np_, np_), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nww, np_, np_), lambda bi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nww, n, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nwh * nww, n, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((nww * np_, 3 * c), dtype),
            pltpu.VMEM((nww * np_, c), jnp.float32),
        ],
    )(
        x_shifted,
        qkv_kernel.astype(dtype),
        qkv_bias.reshape(1, -1).astype(dtype),
        proj_kernel.astype(dtype),
        proj_bias.reshape(1, -1).astype(dtype),
        bias_pad,
        mask_pad,
    )
    # window-major -> spatial (cheap relayout in XLA)
    out = out.reshape(b, nwh, nww, w, w, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return out


def _pad_bias_mask(bias_table, hp, wp, w, sh, sw, num_heads):
    """(heads, NP, NP) bias with -1e9 pad cols; (nW, NP, NP) shift mask."""
    n = w * w
    np_ = _round_up(n, 8)
    rel_idx = relative_position_index(w, w)
    rel = bias_table[rel_idx.reshape(-1)].reshape(n, n, num_heads)
    rel = rel.transpose(2, 0, 1).astype(jnp.float32)  # (heads, N, N)
    bias_pad = jnp.full((num_heads, np_, np_), -1e9, jnp.float32)
    bias_pad = bias_pad.at[:, :n, :n].set(rel)
    # pad ROWS only produce unused outputs; pad COLS are masked by -1e9
    bias_pad = bias_pad.at[:, n:, :].set(0.0)
    bias_pad = bias_pad.at[:, :, n:].set(-1e9)

    shifted = (sh + sw) > 0
    n_win = (hp // w) * (wp // w)
    if shifted:
        m = np.asarray(shifted_window_mask(hp, wp, w, w, sh, sw))
        mp = np.zeros((n_win, np_, np_), np.float32)
        mp[:, :n, :n] = m
        mask = jnp.asarray(mp)
    else:
        mask = jnp.zeros((n_win, np_, np_), jnp.float32)
    return bias_pad, mask


def _pallas_forward(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                    bias_table, window_size, shift_size, num_heads):
    b, h, w0, c = x.shape
    wh, ww = window_size
    assert wh == ww, "square windows only"
    w = wh
    sh, sw = shift_size

    pad_h = -h % w
    pad_w = -w0 % w
    hp, wp = h + pad_h, w0 + pad_w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    if w >= hp:
        sh = 0
    if w >= wp:
        sw = 0
    shifted = (sh + sw) > 0
    if shifted:
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))

    bias_pad, mask = _pad_bias_mask(bias_table, hp, wp, w, sh, sw, num_heads)
    out = _fused_core(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                      bias_pad, mask, window=w, num_heads=num_heads)

    if shifted:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    if pad_h or pad_w:
        out = out[:, :h, :w0, :]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _pallas_window_attention(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                             bias_table, window_size, shift_size, num_heads):
    return _pallas_forward(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                           bias_table, window_size, shift_size, num_heads)


def _vjp_fwd(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
             window_size, shift_size, num_heads):
    out = _pallas_forward(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                          bias_table, window_size, shift_size, num_heads)
    return out, (x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table)


def _vjp_bwd(window_size, shift_size, num_heads, residuals, g):
    x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table = residuals

    def ref_fn(x, qk, qb, pk, pb, bt):
        return wa_ref.shifted_window_attention(
            x, qk, qb, pk, pb, bt,
            window_size=window_size, shift_size=shift_size,
            num_heads=num_heads, deterministic=True,
        )

    _, vjp = jax.vjp(ref_fn, x, qkv_kernel, qkv_bias, proj_kernel,
                     proj_bias, bias_table)
    return vjp(g)


_pallas_window_attention.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_shifted_window_attention(
    x: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array],
    bias_table: jax.Array,
    *,
    window_size: Tuple[int, int],
    shift_size: Tuple[int, int],
    num_heads: int,
    **unused,
) -> jax.Array:
    """Drop-in fused replacement for ``shifted_window_attention``.

    Dropout kwargs are accepted and ignored (callers keep the XLA op when
    attention dropout is active during training).
    """
    c = x.shape[-1]
    if qkv_bias is None:
        qkv_bias = jnp.zeros((3 * c,), x.dtype)
    if proj_bias is None:
        proj_bias = jnp.zeros((c,), x.dtype)
    return _pallas_window_attention(
        x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
        tuple(window_size), tuple(shift_size), num_heads,
    )
