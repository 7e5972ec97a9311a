"""Fully fused decoder head (Pallas TPU): GELU -> x4 depth-to-space ->
3x3 conv -> GELU -> 3x3 conv -> LayerNorm, one HBM pass each direction.

Why: the reference head (``network/model_parts.py:437-476``,
``FinalPatchExpand_X4_V2``) runs at FULL image resolution, so every
composed XLA op is an HBM round trip over a full-res tensor.  The r3
section ablation (512² b8 on the real chip) put the head tail at ~48 ms
of a ~285 ms step — 17% of the step for 20% of the FLOPs.  This kernel
reads the expand projection's output once per direction and keeps every
full-res intermediate in VMEM:

* grid = (batch, row-tile); each program owns ``tr`` token rows
  (= ``4*tr`` output pixel rows) across the full width;
* row halos come from neighbour blocks (clamped index maps, masked at
  the image boundary with ``pl.when`` / ``jnp.where``) — the 3x3 convs
  need a 1 px halo forward on the depth-to-space input and a 2 px halo
  backward on the LayerNorm cotangent;
* the convs run as 9 shifted MXU matmuls ``(rows*cols, C) @ (C, C)``
  accumulated in f32 — with C=128 each matmul exactly fills the MXU;
* SAME-padding semantics are preserved by zeroing the conv1 halo
  rows/cols that fall outside the real image before conv2 consumes them;
* backward is saved-residual, NOT flash-style: the forward emits the
  conv1 pre-activation ``pre`` and the conv2 pre-LN output ``a2`` as
  extra outputs, so the backward runs ZERO conv recomputes (an earlier
  flash-style revision recomputed conv1 and conv2 in the backward tile
  and measured 53-55 ms vs XLA's 48 — the convs are MXU-bound, so +46%
  FLOPs of recompute is exactly the wrong trade at this op's arithmetic
  intensity).  The backward rebuilds only the elementwise pieces
  (``h1 = gelu(pre)``, ``gelu'(pre)``, the LN statistics from ``a2`` —
  per-pixel scalars stay as ``(rows, 1)`` reduction outputs because
  Mosaic cannot relayout a lane-major matrix into a column vector —
  and the depth-to-space gather of ``y``) and spends its MXU time on
  the same four transposed-conv / weight-gradient contractions XLA
  would run.
  Weight/scale gradients accumulate across the whole grid into revisited
  output blocks (TPU grid execution is sequential), and are psum'd over
  the data axis when running per-shard under ``shard_map``.

Numerics: conv accumulation f32 (same as XLA's bf16 convolution), GELU
tanh in f32, LayerNorm statistics f32 with the torch epsilon — matching
``models/layers.py::FinalPatchExpandX4V2``'s composed path to bf16
round-off.  Equality is asserted in interpret mode against the composed
XLA ops in ``tests/test_fused_refine_head.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

_SQRT_2_OVER_PI = 0.7978845608028654
_KAPPA = 0.044715
LN_EPS = 1e-5  # torch nn.LayerNorm default (models/layers.py)


def _gelu_f32(x):
    u = _SQRT_2_OVER_PI * (x + _KAPPA * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_grad_f32(x):
    x2 = x * x
    u = _SQRT_2_OVER_PI * (x + _KAPPA * x * x2)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _KAPPA * x2)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _d2s_planes(row16, wt: int, c: int):
    """One token row ``(wt, 16C)`` -> 4 pixel-row planes ``(4*wt, C)`` f32,
    after tanh-GELU.  Plane p1 holds output columns 4*j+p2 (p1-major
    channel decomposition, same as ``patch_ops.depth_to_space``)."""
    a = _gelu_f32(row16.astype(jnp.float32))
    x4 = a.reshape(wt, 4, 4, c)
    return [x4[:, p].reshape(4 * wt, c) for p in range(4)]


def _rup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _conv9(src_ref, w_ref, rows: int, cols: int, c: int, r0: int, c0: int):
    """Valid 3x3 conv as 9 shifted matmuls over a padded VMEM ref.

    Output grid ``(rows, cols)`` anchored at ``(r0, c0)`` in ``src_ref``
    (i.e. the (u,v) tap reads ``src[r0-1+u : .., c0-1+v : ..]``).
    Returns f32 ``(rows*cols, C)``.

    ``cols`` MUST be a multiple of 8: the ``(rows, cols, C) ->
    (rows*cols, C)`` collapse is then tile-exact (cols fills whole
    sublane tiles) and free.  A misaligned collapse makes Mosaic emit a
    relayout per tap — measured as a 15-min kernel compile and a 43 MB
    scoped-vmem stack at W=512; callers pad ``cols`` and zero the junk
    columns instead.
    """
    assert cols % 8 == 0, cols
    acc = None
    for u in range(3):
        for v in range(3):
            patch = src_ref[r0 - 1 + u:r0 - 1 + u + rows,
                            c0 - 1 + v:c0 - 1 + v + cols, :]
            d = jax.lax.dot_general(
                patch.reshape(rows * cols, c), w_ref[u * 3 + v],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    return acc


def _fill_xp(xp_ref, yp_ref, y_ref, yn_ref, *, tr, wt, c, n_tiles, halo):
    """Zero ``xp_ref`` and fill it with the GELU'd depth-to-space tile.

    ``halo``: pixel rows of context on each side (2 fwd, 1 bwd); own
    rows land at ``xp[halo : halo+4tr]``; columns at ``[2 : 2+W]``.
    """
    t = pl.program_id(1)
    w = 4 * wt
    xp_ref[...] = jnp.zeros_like(xp_ref)
    for r in range(tr):
        planes = _d2s_planes(y_ref[0, r], wt, c)
        for p in range(4):
            xp_ref[halo + 4 * r + p, 2:2 + w, :] = (
                planes[p].astype(xp_ref.dtype))

    @pl.when(t > 0)
    def _():
        planes = _d2s_planes(yp_ref[0, 0], wt, c)
        for k in range(halo):  # last `halo` pixel rows of the prev tile
            xp_ref[k, 2:2 + w, :] = planes[4 - halo + k].astype(xp_ref.dtype)

    @pl.when(t < n_tiles - 1)
    def _():
        planes = _d2s_planes(yn_ref[0, 0], wt, c)
        for k in range(halo):  # first `halo` pixel rows of the next tile
            xp_ref[halo + 4 * tr + k, 2:2 + w, :] = (
                planes[k].astype(xp_ref.dtype))


def _fwd_body(yp_ref, y_ref, yn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              g_ref, be_ref, o_ref, pre_o_ref, a2_o_ref,
              xp_ref, h1_ref, *, tr: int, wt: int, c: int, n_tiles: int):
    """Forward tile.  ``pre_o_ref``/``a2_o_ref`` are None on the
    primal-only (inference) variant."""
    t = pl.program_id(1)
    w = 4 * wt
    wp1 = _rup8(w + 2)  # conv1 output cols, padded to whole sublane tiles
    _fill_xp(xp_ref, yp_ref, y_ref, yn_ref, tr=tr, wt=wt, c=c,
             n_tiles=n_tiles, halo=2)

    # conv1 over rows [-1, 4tr+1), cols [-1, W+1) (+ zeroed pad cols)
    r1 = 4 * tr + 2
    acc1 = _conv9(xp_ref, w1_ref, r1, wp1, c, r0=1, c0=1)
    pre = acc1.astype(h1_ref.dtype) + b1_ref[0]
    h1 = _gelu_f32(pre.astype(jnp.float32)).astype(h1_ref.dtype)
    h1_ref[...] = h1.reshape(r1, wp1, c)
    # SAME-padding: conv1 outputs outside the real image are zero pads
    h1_ref[:, 0, :] = jnp.zeros_like(h1_ref[:, 0, :])
    h1_ref[:, w + 1:, :] = jnp.zeros_like(h1_ref[:, w + 1:, :])

    @pl.when(t == 0)
    def _():
        h1_ref[0] = jnp.zeros_like(h1_ref[0])

    @pl.when(t == n_tiles - 1)
    def _():
        h1_ref[r1 - 1] = jnp.zeros_like(h1_ref[r1 - 1])

    if pre_o_ref is not None:
        # backward residual: conv1 pre-activation on OWN rows/cols (the
        # backward rebuilds h1 = gelu(pre) / gelu'(pre) elementwise
        # instead of re-running either conv — the convs are MXU-heavy,
        # so flash-style recompute LOSES here, measured 53-55 vs 48 ms)
        pre_o_ref[0] = pre.reshape(r1, wp1, c)[1:1 + 4 * tr, 1:1 + w, :]

    acc2 = _conv9(h1_ref, w2_ref, 4 * tr, w, c, r0=1, c0=1)
    a2s = acc2.astype(o_ref.dtype) + b2_ref[0]  # storage-dtype, saved
    if a2_o_ref is not None:
        a2_o_ref[0] = a2s.reshape(4 * tr, w, c)
    a2 = a2s.astype(jnp.float32)
    mu = jnp.mean(a2, axis=-1, keepdims=True)
    va = jnp.mean(a2 * a2, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(va + LN_EPS)
    xhat = (a2 - mu) * inv
    outn = (xhat * g_ref[0].astype(jnp.float32)
            + be_ref[0].astype(jnp.float32))
    o_ref[0] = outn.reshape(4 * tr, w, c).astype(o_ref.dtype)


def _fwd_kernel(yp_ref, y_ref, yn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, be_ref, o_ref, xp_ref, h1_ref, **kw):
    _fwd_body(yp_ref, y_ref, yn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              g_ref, be_ref, o_ref, None, None, xp_ref, h1_ref, **kw)


def _fwd_res_kernel(yp_ref, y_ref, yn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    g_ref, be_ref, o_ref, pre_o_ref, a2_o_ref,
                    xp_ref, h1_ref, **kw):
    _fwd_body(yp_ref, y_ref, yn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              g_ref, be_ref, o_ref, pre_o_ref, a2_o_ref,
              xp_ref, h1_ref, **kw)


def _bwd_kernel(yp_ref, y_ref, yn_ref,
                prp_ref, pr_ref, prn_ref,
                dop_ref, do_ref, don_ref,
                a2p_ref, a2_ref, a2n_ref,
                w1_ref, w2_ref, g_ref,
                dy_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbe_ref,
                xp_ref, h1_ref, da2_ref, da1_ref, dxp_ref,
                *, tr: int, wt: int, c: int, n_tiles: int):
    t = pl.program_id(1)
    b_ = pl.program_id(0)
    w = 4 * wt
    wp1 = _rup8(w + 2)
    first = jnp.logical_and(b_ == 0, t == 0)

    @pl.when(first)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    # ---- rebuild xp (1 px halo: dW1 patches span rows [-1, 4tr+1)) ----
    _fill_xp(xp_ref, yp_ref, y_ref, yn_ref, tr=tr, wt=wt, c=c,
             n_tiles=n_tiles, halo=1)

    # ---- h1 = gelu(pre) on rows [-1, 4tr+1) from the saved residual ----
    rh = 4 * tr + 2
    h1_ref[...] = jnp.zeros_like(h1_ref)  # pad cols / boundary rows = 0
    h1_ref[1:1 + 4 * tr, 1:1 + w, :] = _gelu_f32(
        pr_ref[0].astype(jnp.float32)).astype(h1_ref.dtype)

    @pl.when(t > 0)
    def _():
        h1_ref[0, 1:1 + w, :] = _gelu_f32(
            prp_ref[0, 0].astype(jnp.float32)).astype(h1_ref.dtype)

    @pl.when(t < n_tiles - 1)
    def _():
        h1_ref[rh - 1, 1:1 + w, :] = _gelu_f32(
            prn_ref[0, 0].astype(jnp.float32)).astype(h1_ref.dtype)

    # ---- LayerNorm backward on rows [-2, 4tr+2) (mean/var form) ----
    # statistics are recomputed from the saved conv2 output ``a2``
    # (lane-major like everything else: mu/inv stay (rows, 1) reduction
    # outputs — Mosaic cannot relayout a lane-major matrix into a
    # column vector, so a saved per-pixel ``inv`` tensor is unusable).
    # Halo strips are masked to zero at the image boundary (those rows
    # don't exist); zero dout rows yield zero da2 rows.
    r2 = 4 * tr + 4
    zc = jnp.zeros((2, w, c), jnp.float32)
    dout = jnp.concatenate([
        jnp.where(t > 0, dop_ref[0].astype(jnp.float32), zc),
        do_ref[0].astype(jnp.float32),
        jnp.where(t < n_tiles - 1, don_ref[0].astype(jnp.float32), zc),
    ], axis=0).reshape(r2 * w, c)
    a2 = jnp.concatenate([
        jnp.where(t > 0, a2p_ref[0].astype(jnp.float32), zc),
        a2_ref[0].astype(jnp.float32),
        jnp.where(t < n_tiles - 1, a2n_ref[0].astype(jnp.float32), zc),
    ], axis=0).reshape(r2 * w, c)
    mu = jnp.mean(a2, axis=-1, keepdims=True)
    va = jnp.mean(a2 * a2, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(va + LN_EPS)
    xhat = (a2 - mu) * inv

    gam = g_ref[0].astype(jnp.float32)
    dxh = dout * gam
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    da2 = (dxh - m1 - xhat * m2) * inv  # (r2*W, C) f32
    # cotangents are stored/multiplied at the model dtype with f32
    # accumulation — XLA's bf16 conv-backward contract
    da2_st = da2.astype(da2_ref.dtype)
    da2_ref[...] = jnp.zeros_like(da2_ref)
    da2_ref[:, 1:1 + w, :] = da2_st.reshape(r2, w, c)

    # scale/shift grads over OWN rows only (local rows [2, 2+4tr))
    own = slice(2 * w, (2 + 4 * tr) * w)
    dg_ref[0] += jnp.sum(dout[own] * xhat[own], axis=0)
    dbe_ref[0] += jnp.sum(dout[own], axis=0)
    db2_ref[0] += jnp.sum(da2[own], axis=0)

    # dW2[u,v] += h1[r+u-1, w+v-1]^T da2[r, w] over own rows (h1 own
    # rows sit at index 1).  Every collapse below is over W columns
    # (a multiple of 8): tile-exact.
    da2_own = da2_st[own]
    for u in range(3):
        for v in range(3):
            patch = h1_ref[u:u + 4 * tr, v:v + w, :]
            dw2_ref[u * 3 + v] += jax.lax.dot_general(
                patch.reshape(4 * tr * w, c),
                da2_own, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # dh1[p,q] = sum_{u,v} da2[p-u+1, q-v+1] W2[u,v]^T  on rows [-1,4tr+1)
    acc = None
    for u in range(3):
        for v in range(3):
            patch = da2_ref[2 - u:2 - u + rh, 2 - v:2 - v + w, :]
            d = jax.lax.dot_general(
                patch.reshape(rh * w, c), w2_ref[u * 3 + v],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    # da1 = dh1 * gelu'(pre) on the same rows, pre from the saved
    # residual (boundary rows are force-zeroed below — SAME-pad outputs
    # carry no gradient)
    pre_h = jnp.concatenate([
        jnp.where(t > 0, prp_ref[0].astype(jnp.float32), zc[:1]),
        pr_ref[0].astype(jnp.float32),
        jnp.where(t < n_tiles - 1, prn_ref[0].astype(jnp.float32), zc[:1]),
    ], axis=0).reshape(rh * w, c)
    da1 = acc * _gelu_grad_f32(pre_h)  # f32
    da1_st = da1.astype(da1_ref.dtype)
    da1_ref[...] = jnp.zeros_like(da1_ref)
    da1_ref[:, 1:1 + w, :] = da1_st.reshape(rh, w, c)

    @pl.when(t == 0)
    def _():
        da1_ref[0] = jnp.zeros_like(da1_ref[0])

    @pl.when(t == n_tiles - 1)
    def _():
        da1_ref[rh - 1] = jnp.zeros_like(da1_ref[rh - 1])

    # own pixel rows [0, 4tr) are da1 value rows [1, 1+4tr) — never the
    # boundary-zeroed rows, so the f32 value can serve the reductions
    own1 = slice(1 * w, (1 + 4 * tr) * w)
    db1_ref[0] += jnp.sum(da1[own1], axis=0)
    da1_own = da1_st[own1]

    # dW1[u,v] += xp[r+u-1, w+v-1]^T da1[r, w] over own rows (xp own
    # rows sit at index halo=1, own cols at 2)
    for u in range(3):
        for v in range(3):
            patch = xp_ref[u:u + 4 * tr, 1 + v:1 + v + w, :]
            dw1_ref[u * 3 + v] += jax.lax.dot_general(
                patch.reshape(4 * tr * w, c),
                da1_own, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # dxp[p,q] = sum_{u,v} da1[p-u+1, q-v+1] W1[u,v]^T  on own rows
    acc = None
    for u in range(3):
        for v in range(3):
            patch = da1_ref[2 - u:2 - u + 4 * tr, 2 - v:2 - v + w, :]
            d = jax.lax.dot_general(
                patch.reshape(4 * tr * w, c), w1_ref[u * 3 + v],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    dxp_ref[...] = acc.reshape(4 * tr, w, c)

    # d2s gather + GELU grad -> dy for own token rows
    for r in range(tr):
        planes = [dxp_ref[4 * r + p].reshape(wt, 4, c) for p in range(4)]
        g4 = jnp.stack(planes, axis=1)  # (wt, p1, p2, C)
        gflat = g4.reshape(wt, 16 * c)
        yrow = y_ref[0, r].astype(jnp.float32)
        dy_ref[0, r] = (gflat * _gelu_grad_f32(yrow)).astype(dy_ref.dtype)


def _pick_tr(ht: int, w: int, c: int, dt: int = 2) -> int:
    """Token rows per tile: biggest power of two dividing ``ht`` whose
    largest backward f32 temporary ``(4tr+4, W, C)`` stays under ~10 MB
    (several such are live at once; v5e VMEM is 128 MB).  ``dt`` is the
    model itemsize: the storage-dtype blocks/scratch double in f32 and
    the 512² f32 step measured 119 MB against the kernel's 100 MB vmem
    limit at tr=8 (2026-08-20), so f32 halves the budget."""
    budget = 10_000_000 if dt == 2 else 5_000_000
    for tr in (8, 4, 2, 1):
        if ht % tr == 0 and (4 * tr + 4) * w * c * 4 <= budget:
            return tr
    return 1


def _row_specs(ht4, w, c, tr, halo: int):
    """Own-rows block + ``halo``-row neighbour strips of a saved
    ``(B, 4Ht, W, C)`` pixel-resolution residual (clamped at the
    boundary; the kernel masks the clamped reads)."""
    def prev(b_, t):
        return (b_, jnp.maximum(4 * tr * t // halo - 1, 0), 0, 0)

    def nxt(b_, t):
        return (b_, jnp.minimum(4 * tr * (t + 1) // halo,
                                ht4 // halo - 1), 0, 0)

    return [
        pl.BlockSpec((1, halo, w, c), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * tr, w, c), lambda b_, t: (b_, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, halo, w, c), nxt, memory_space=pltpu.VMEM),
    ]


def _specs(b, ht, wt, c16, c, tr, dtype):
    w = 4 * wt
    n_tiles = ht // tr
    grid = (b, n_tiles)
    y_specs = [
        pl.BlockSpec((1, 1, wt, c16),
                     lambda b_, t: (b_, jnp.maximum(t * tr - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, wt, c16), lambda b_, t: (b_, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wt, c16),
                     lambda b_, t: (b_, jnp.minimum((t + 1) * tr, ht - 1),
                                    0, 0),
                     memory_space=pltpu.VMEM),
    ]
    w_specs = [
        pl.BlockSpec((9, c, c), lambda b_, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c, c), lambda b_, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, 4 * tr, w, c), lambda b_, t: (b_, t, 0, 0),
                          memory_space=pltpu.VMEM)
    return grid, y_specs, w_specs, o_spec, n_tiles, w


def _prep_params(w1, b1, w2, b2, gamma, beta, dtype):
    c = w1.shape[-1]
    return (
        w1.reshape(9, c, c).astype(dtype),
        b1.reshape(1, c).astype(dtype),
        w2.reshape(9, c, c).astype(dtype),
        b2.reshape(1, c).astype(dtype),
        gamma.reshape(1, c).astype(jnp.float32),
        beta.reshape(1, c).astype(jnp.float32),
    )


def _fwd_pallas(y, w1, b1, w2, b2, gamma, beta, save_residuals: bool):
    b, ht, wt, c16 = y.shape
    c = c16 // 16
    tr = _pick_tr(ht, 4 * wt, c, y.dtype.itemsize)
    grid, y_specs, w_specs, o_spec, n_tiles, w = _specs(
        b, ht, wt, c16, c, tr, y.dtype)
    w1r, b1r, w2r, b2r, gr, ber = _prep_params(
        w1, b1, w2, b2, gamma, beta, y.dtype)
    if save_residuals:
        kernel = _fwd_res_kernel
        out_shape = (
            jax.ShapeDtypeStruct((b, 4 * ht, w, c), y.dtype),   # out
            jax.ShapeDtypeStruct((b, 4 * ht, w, c), y.dtype),   # pre
            jax.ShapeDtypeStruct((b, 4 * ht, w, c), y.dtype),   # a2
        )
        out_specs = (o_spec, o_spec, o_spec)
    else:
        kernel = _fwd_kernel
        out_shape = jax.ShapeDtypeStruct((b, 4 * ht, w, c), y.dtype)
        out_specs = o_spec
    return pl.pallas_call(
        functools.partial(kernel, tr=tr, wt=wt, c=c, n_tiles=n_tiles),
        out_shape=out_shape,
        grid=grid,
        in_specs=y_specs + w_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((4 * tr + 4, _rup8(w + 2) + 2, c), y.dtype),   # xp
            pltpu.VMEM((4 * tr + 2, _rup8(w + 2), c), y.dtype),       # h1
        ],
        compiler_params=pltpu.CompilerParams(
            # f32 conv/LN temporaries at full width exceed the default
            # 16 MB scoped-vmem stack; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(y, y, y, w1r, b1r, w2r, b2r, gr, ber)


def _bwd_pallas(y, pre, a2, dout, w1, w2, gamma):
    b, ht, wt, c16 = y.shape
    c = c16 // 16
    tr = _pick_tr(ht, 4 * wt, c, y.dtype.itemsize)
    w = 4 * wt
    n_tiles = ht // tr
    grid = (b, n_tiles)
    _, y_specs, _, _, _, _ = _specs(b, ht, wt, c16, c, tr, y.dtype)
    pre_specs = _row_specs(4 * ht, w, c, tr, halo=1)
    do_specs = _row_specs(4 * ht, w, c, tr, halo=2)
    a2_specs = _row_specs(4 * ht, w, c, tr, halo=2)
    w_specs = [
        pl.BlockSpec((9, c, c), lambda b_, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c, c), lambda b_, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    zb = jnp.zeros((c,), y.dtype)  # biases don't enter the backward
    w1r, _, w2r, _, gr, _ = _prep_params(
        w1, zb, w2, zb, gamma, gamma, y.dtype)
    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda b_, t: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(y.shape, y.dtype),             # dy
        jax.ShapeDtypeStruct((9, c, c), jnp.float32),       # dW1
        jax.ShapeDtypeStruct((1, c), jnp.float32),          # db1
        jax.ShapeDtypeStruct((9, c, c), jnp.float32),       # dW2
        jax.ShapeDtypeStruct((1, c), jnp.float32),          # db2
        jax.ShapeDtypeStruct((1, c), jnp.float32),          # dgamma
        jax.ShapeDtypeStruct((1, c), jnp.float32),          # dbeta
    )
    out_specs = (
        pl.BlockSpec((1, tr, wt, c16), lambda b_, t: (b_, t, 0, 0),
                     memory_space=pltpu.VMEM),
        acc_spec((9, c, c)), acc_spec((1, c)), acc_spec((9, c, c)),
        acc_spec((1, c)), acc_spec((1, c)), acc_spec((1, c)),
    )
    rh = 4 * tr + 2
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tr=tr, wt=wt, c=c, n_tiles=n_tiles),
        out_shape=out_shapes,
        grid=grid,
        in_specs=y_specs + pre_specs + do_specs + a2_specs + w_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((4 * tr + 2, _rup8(w + 2) + 2, c), y.dtype),  # xp
            pltpu.VMEM((rh, _rup8(w + 2), c), y.dtype),        # h1
            pltpu.VMEM((4 * tr + 4, w + 2, c), y.dtype),       # da2 (padded)
            pltpu.VMEM((rh, w + 2, c), y.dtype),               # da1 (padded)
            pltpu.VMEM((4 * tr, w, c), jnp.float32),           # dxp
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(y, y, y, pre, pre, pre, dout, dout, dout, a2, a2, a2,
      w1r, w2r, gr)
    return outs


@jax.custom_vjp
def fused_refine_head(y, w1, b1, w2, b2, gamma, beta):
    """GELU -> x4 depth-to-space -> conv3x3+GELU -> conv3x3 -> LayerNorm.

    ``(B, Ht, Wt, 16C) -> (B, 4Ht, 4Wt, C)`` — the whole
    ``FinalPatchExpand_X4_V2`` tail after the expand projection
    (reference ``model_parts.py:437-476``) in one fused pass.

    ``w1``/``w2``: HWIO ``(3,3,C,C)``; ``b1``/``b2``/``gamma``/``beta``:
    ``(C,)``.  Under ``shard_map`` the parameter cotangents need no
    explicit collective: the shard_map transpose psums replicated
    (``P()``) inputs' cotangents itself.
    """
    return _fwd_pallas(y, w1, b1, w2, b2, gamma, beta,
                       save_residuals=False)


def _frh_fwd(y, w1, b1, w2, b2, gamma, beta):
    out, pre, a2 = _fwd_pallas(y, w1, b1, w2, b2, gamma, beta,
                               save_residuals=True)
    return out, (y, pre, a2, w1, w2, gamma)


def _frh_bwd(res, dout):
    y, pre, a2, w1, w2, gamma = res
    dy, dw1, db1, dw2, db2, dg, dbe = _bwd_pallas(
        y, pre, a2, dout, w1, w2, gamma)
    c = w1.shape[-1]
    return (dy,
            dw1.reshape(3, 3, c, c).astype(w1.dtype),
            db1.reshape(c),
            dw2.reshape(3, 3, c, c).astype(w2.dtype),
            db2.reshape(c),
            dg.reshape(c).astype(gamma.dtype),
            dbe.reshape(c))


fused_refine_head.defvjp(_frh_fwd, _frh_bwd)


def fused_refine_head_sharded(y, w1, b1, w2, b2, gamma, beta,
                              data_mesh, data_axis: str = "data"):
    """Per-data-shard :func:`fused_refine_head` via ``shard_map``
    (Pallas custom calls have no GSPMD rule; the shard_map transpose
    psums the replicated params' cotangents over the data axis)."""
    from jax.sharding import PartitionSpec as P

    n = data_mesh.shape.get(data_axis, 1)
    if n <= 1 or y.shape[0] % n:
        return fused_refine_head(y, w1, b1, w2, b2, gamma, beta)
    f = jax.shard_map(
        fused_refine_head,
        mesh=data_mesh,
        in_specs=(P(data_axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(data_axis),
        check_vma=False,  # pallas outputs carry no vma annotation
    )
    return f(y, w1, b1, w2, b2, gamma, beta)


def supported(x_shape: Tuple[int, ...], gelu_tanh: bool) -> bool:
    """Kernel applicability: tanh mode, C=128 (one lane tile), a width
    whose scratch budget still allows tr>=2, TPU backend."""
    if not gelu_tanh:
        return False
    b, ht, wt, c16 = x_shape
    if c16 != 16 * 128:
        return False
    if (4 * wt) % 8 != 0:  # tile-exact (rows, W) collapses in the body
        return False
    if _pick_tr(ht, 4 * wt, 128) < 2:
        return False
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
