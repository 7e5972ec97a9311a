"""Fused shifted-window attention (Pallas TPU kernel, round-2 rewrite).

Why: at window 7 the XLA path materializes every window-shaped tensor in
HBM with severe tile padding — ``(…,49,49)`` scores pad ×3.4 on the
(16,128) bf16 tile and the per-head ``(…,49,32)`` q/k/v relayouts pad
×4.6 — so stage-0/1 attention runs ~16× over the bandwidth floor
(measured v5e, 512²: ~8 ms fwd+bwd per stage-0 block of a 3-ms-fwd
step).  This kernel keeps all window-shaped intermediates in VMEM:

* grid = (batch[/pack], window-row strip[, width-chunk]); the strip of
  spatial-rolled qkv is window-partitioned **in VMEM** (static sublane
  slices, no HBM relayout);
* at small token grids (32²/16²) several images' strips are packed
  into one program as extra windows (``_pick_bp``) — per-program fixed
  costs dominated those stages (stage 2's 18 blocks, 40 programs each,
  were the largest 512² step item);
* per head, windows are packed along the sublane axis and scored with
  ONE MXU matmul per ≤10-window group — the block-diagonal waste costs
  only MXU FLOPs (attention matmuls are <1% of model FLOPs), never HBM;
* the valid diagonal 49×49 blocks are extracted with static slices,
  get bias+mask+softmax as one small batched VPU op, and are scattered
  into a zero block-diagonal probs matrix (zeroed once per program) for
  ONE context matmul per head;
* backward recomputes scores/probs flash-style from the saved qkv —
  nothing else is saved, so train-step live memory drops by the probs
  tensors the XLA path keeps for its VJP;
* the relative-position-bias gradient is accumulated across the whole
  grid into a single revisited output block (TPU grid execution is
  sequential);
* strips wider than ``_MAX_BODY_WINDOWS`` are split into uniform width
  chunks carried as their own array dimension (``(B,Hp,k,g*ww,3C)``) —
  1024²'s 37-window strips otherwise unroll kernel bodies big enough to
  OOM the Mosaic compiler, and Pallas only allows a block's
  second-to-last dim to be a strict slice when it divides by 8.

Measured (v5e, 512² batch 8, r2): op-level fwd+bwd 6.8 vs 8.0 ms at
stage 0 (s0) and 2.8 vs 3.1 ms at stage 1 — but the in-step effect is
larger because the XLA path's saved-probs tensors and their padded
relayout copies disappear from the whole train graph: full train step
24.08 -> 28.05 img/s/chip (+16%), and 512² batch 16 fits HBM where the
XLA path OOMs.  Enabled by default (``TPU.USE_PALLAS_ATTENTION``).

Numerics match ``ops/window_attention.py`` (torchvision semantics,
reference ``network/model_parts.py:36,143-151``): zero-padded tokens
participate in unshifted attention, shifted blocks use the 9-region
additive mask, softmax in f32.  Exactness is asserted in
``tests/test_fused_window_attention.py`` (interpret mode) and the op is
gated by ``TPU.USE_PALLAS_ATTENTION`` + backend/shape support.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import (
    relative_position_index,
    shifted_window_mask_dev,
)

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

# max packed tokens per score matmul.  Bounds VMEM (the f32 score matrix,
# two probs matrices and their slice temporaries must fit the 16 MB scoped
# stack in the backward kernel) and the block-diagonal MXU waste (= windows
# per group).  512 => groups of 10 windows at window 7.  Tile-pass note
# (BASELINE.md r4): a 10-window group's (490,490) score matmul is 16 MXU
# passes vs 8 for two 5-window groups — SSA_ATTN_S_CAP=256 exists for
# the hardware A/B of the narrower grouping.
_S_CAP = int(os.environ.get("SSA_ATTN_S_CAP", "512"))

# widest strip compiled as one program (in-kernel group loop).  Wider
# strips are width-chunked onto the grid: a 37-window body OOMs the
# Mosaic compiler, while 19/20 windows (512² stage 0) compile fine and
# run ~2% faster than chunked programs (fewer programs, no pad windows).
_MAX_BODY_WINDOWS = 20

# Program-count dead ends (measured; do NOT re-add without new evidence):
# * WHOLE-IMAGE programs (grid = batch) for the 32²/16² grids: unrolled
#   image bodies (25 windows × 16 heads; 9 × 32 at stage 3) SIGKILL the
#   remote Mosaic compiler, and in-body head loops can't be rolled
#   because dynamic lane slices must be 128-aligned (probed, r2).
# * r3 rewrite with 16-aligned window slot stride (nh=64) + batch
#   packing (several images block-diagonal per program, visit-capped):
#   won at op level but LOST in-step — 512² b8 full train step 26.77
#   img/s vs 27.79 for this strip kernel, reproduced (r3 A/B,
#   /tmp/bench_r3{a,b,_oldattn}.log); the padded qkv slot layout leaks
#   relayout cost into the surrounding graph.


# compile-size bound for batch packing: heads × windows visited per
# program body (the r2 whole-image SIGKILLs were 400 visits; the widest
# shipped strip bodies ~96 compile fine).  The backward body is ~2.5×
# the forward's op count per visit (7 matmuls + dual scatter loops vs
# 2 + 1), so its cap is lower: 160 packs stage 1 (8h×2×10) and stage 2
# (16h×2×5) but leaves stage 3 (32h×2×3=192) unpacked — its 2+2 blocks
# at the 16² grid are a minor cost anyway.
_VISIT_CAP = 200
_BWD_VISIT_CAP = 160


def _chunk_windows(n_tok: int) -> int:
    """Windows per width-chunk when a strip must be split."""
    return max(1, _S_CAP // n_tok)


def _pack_scratch_bytes(bp: int, nww: int, n: int, c3: int,
                        dt: int = 2, bwd: bool = False) -> int:
    """Static scratch estimate for a (possibly packed) program.

    ``dt`` is the input itemsize: the deployment dtype is bf16 (2), but
    the kernel also runs f32 models (e.g. the parity tools) — a
    dtype-blind estimate let bp=2 through in f32 and overflowed the
    16 MB scoped-vmem stack (measured 18.92 MB at the 512² stage-1
    strip, 2026-08-20).  The backward footprint is wm + dwm + dcw +
    the f32 score/dP temps + two block-diagonal matrices.
    """
    c = c3 // 3
    s_all = bp * nww * n
    s_cap = min(nww, _chunk_windows(n)) * n
    if bwd:
        return (2 * s_all * c3 * dt             # wm + dwm
                + s_all * c * dt                # dcw
                + s_cap * s_cap * (4 + 2 * dt)  # s + z + z2
                + 3 * s_cap * n * 4)            # p, dp, mask rows
    return (s_all * c3 * dt             # wm
            + s_all * c * dt            # ow
            + s_cap * s_cap * (4 + dt)  # s + z
            + 2 * s_cap * n * 4)        # p, mask rows


# packing budget for the estimate above: measured peaks run up to ~3.5×
# the static scratch (18.92 MB actual from a 5.84 MiB static estimate;
# 16.51 MB actual from a 4.68 MiB f32 stage-2 forward estimate that a
# 4.5 MiB cap let through, 2026-08-20) vs the 16 MB scoped-vmem stack
# limit -> 4.25 MiB keeps the projected peak under the stack; shipped
# bf16 shapes max out ~3.6 MB static either way, so only marginal f32
# packings are excluded.
_PACK_SCRATCH_CAP = int(4.25 * 2 ** 20)


def _pick_bp(b: int, heads: int, nww: int, n: int, c3: int,
             dt: int = 2, bwd: bool = False) -> int:
    """Images packed per program (small grids only).

    At the 32²/16² token grids per-program fixed costs dominate the
    step (stage 2's 18 blocks were the largest 512² item, 40 programs
    each); packing images as extra windows into the SAME 49-stride
    layout halves the program count — without the slot-padding
    relayouts that sank the r3 aligned rewrite (26.77 vs 27.79 img/s).
    Score groups stay per-image so the (s,s) score/probs scratch keeps
    its proven unpacked size; packing grows only the window-major
    qkv/dqkv scratch, bounded by ``_pack_scratch_bytes`` (measured
    peaks run up to ~3.2× the static estimate).  Also bounded by the
    head×window-visit compile cap.  Backward packing exists behind
    ``SSA_ATTN_BWD_PACK=1`` but measured in-step NEGATIVE (28.71 vs
    29.91 img/s, 512² b8, 2026-08-20) — backward programs are compute-
    bound, not fixed-cost-bound — so only the forward packs by default.
    """
    cap = _BWD_VISIT_CAP if bwd else _VISIT_CAP
    bp = 1
    while (bp * 2 <= b and b % (bp * 2) == 0
           and bp * 2 * nww <= _MAX_BODY_WINDOWS
           and heads * bp * 2 * nww <= cap
           and _pack_scratch_bytes(bp * 2, nww, n, c3, dt,
                                   bwd) <= _PACK_SCRATCH_CAP):
        bp *= 2
    return bp


def _group_sizes(n_win: int, n_tok: int,
                 cap: int = 0) -> Tuple[int, ...]:
    """Split a program's ``n_win`` windows into <=cap//n_tok groups
    (``cap`` in packed tokens; 0 => _S_CAP)."""
    g_cap = max(1, (cap or _S_CAP) // n_tok)
    sizes = [g_cap] * (n_win // g_cap)
    if n_win % g_cap:
        sizes.append(n_win % g_cap)
    return tuple(sizes)


# Backward score-group token cap, per shape: a strip whose unpacked
# backward static stack estimate exceeds this drops to 5-window groups
# (cap 256), shrinking the f32 score/dS/probs scratch ~4x.  The only
# flagship shape this triggers on is the 1024² dim-512 strip
# ((2,70,70,·3·512): 5.7 MB static -> 16.07 MB actual, 72K OVER the
# 16 MB scoped-vmem stack even with the unshifted-mask fix); 512²
# bf16 shapes stay at cap 512 (their measured 9-10 MB stacks are fine,
# and the whole-model SSA_ATTN_S_CAP=256 A/B read ~neutral in-step).
_BWD_GCAP_LIMIT = int(4.25 * 2 ** 20)


def _bwd_gcap(nww: int, n: int, c3: int, dt: int) -> int:
    if _pack_scratch_bytes(1, nww, n, c3, dt, bwd=True) > _BWD_GCAP_LIMIT:
        return 256
    return _S_CAP


def _tile_to_wm(tile, wm_ref, wh: int, ww: int, c3: int, base: int = 0):
    """Spatial tile ``(R*wh, Wc, 3C)`` -> window-major rows of ``wm_ref``.

    Handles one window-row strip (R=1) or a width chunk of one; window
    index order is row-major (wr * nww + wc).  ``base``: first wm row
    (batch-packed programs stack images' windows).
    """
    n = wh * ww
    nwh, nww = tile.shape[0] // wh, tile.shape[1] // ww
    for wr in range(nwh):
        for wc_ in range(nww):
            w = wr * nww + wc_
            wm_ref[base + w * n:base + (w + 1) * n, :] = (
                tile[wr * wh:(wr + 1) * wh,
                     wc_ * ww:(wc_ + 1) * ww, :].reshape(n, c3)
            )


def _softmax_rows(x):
    """Row softmax over the last axis, f32, max-subtracted."""
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(
    qkv_ref,   # (1, wh, 1, Wc, 3C) spatial-rolled width-chunk
    bias_ref,  # (heads, N, N) f32
    mask_ref,  # (1, 1, nWc, N, N) f32 additive (zeros when unshifted)
    o_ref,     # (1, wh, 1, Wc, C)
    wm_ref,    # scratch (nWc*N, 3C) input dtype, window-major qkv
    s_ref,     # scratch (S_cap, S_cap) f32 score matrix
    p_ref,     # scratch (S_cap, N) f32 diagonal prob blocks
    z_ref,     # scratch (S_cap, S_cap) input dtype, block-diag probs
    ow_ref,    # scratch (nWc*N, C) input dtype, window-major context
    *,
    wh: int,
    ww: int,
    heads: int,
    chunked: bool,
    masked: bool,
):
    if chunked:
        tiles = [qkv_ref[0, :, 0]]
    else:
        tiles = [qkv_ref[i] for i in range(qkv_ref.shape[0])]
    bp = len(tiles)
    hb, wc, c3 = tiles[0].shape
    c = c3 // 3
    hd = c // heads
    n = wh * ww
    nwi = (hb // wh) * (wc // ww)  # windows per image strip
    nwc = bp * nwi                 # windows in this program
    scale = hd ** -0.5
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    if chunked:
        first = jnp.logical_and(first, pl.program_id(2) == 0)

    # probs matrix: only diagonal blocks are ever written below, so one
    # zero-fill on the first program keeps every off-diagonal entry zero
    # for the whole grid (group sizes only shrink within a program, and a
    # stale diagonal block from a larger earlier group lies entirely
    # outside the rows a smaller group reads).
    @pl.when(first)
    def _():
        z_ref[...] = jnp.zeros_like(z_ref)

    for i, t in enumerate(tiles):
        _tile_to_wm(t, wm_ref, wh, ww, c3, base=i * nwi * n)

    w0 = 0
    # per-image groups: packed programs reuse the proven unpacked
    # score/probs scratch footprint (scoped-vmem stack limit)
    for g in _group_sizes(nwi, n) * bp:
        s = g * n
        for h in range(heads):
            q = wm_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]
            k = wm_ref[w0 * n:w0 * n + s, c + h * hd:c + (h + 1) * hd]
            v = wm_ref[w0 * n:w0 * n + s, 2 * c + h * hd:2 * c + (h + 1) * hd]
            s_ref[:s, :s] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # diagonal NxN blocks -> (s, N) with bias + shift mask
            for w in range(g):
                p_ref[w * n:(w + 1) * n, :] = (
                    s_ref[w * n:(w + 1) * n, w * n:(w + 1) * n]
                )
            blk = p_ref[:s, :] * scale
            blk += jnp.broadcast_to(bias_ref[h][None], (g, n, n)).reshape(s, n)
            # unshifted blocks skip the mask entirely (``masked=False``):
            # an all-zero mask operand folds to an XLA broadcast that
            # Mosaic materializes INSIDE scoped vmem — the (1,10,49,49)
            # block alone put the 1024² dim-512 strip 992K over the
            # 16 MB stack (2026-08-20) — and the additions are dead work
            if masked:
                mall = (mask_ref[0, 0] if chunked
                        else mask_ref[...].reshape(nwi, n, n))
                if bp == 1:
                    blk += mall[w0:w0 + g].reshape(s, n)
                else:  # packed windows wrap around per-image strip masks
                    blk += jnp.concatenate(
                        [mall[(w0 + j) % nwi] for j in range(g)], axis=0)
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

    nww_blk = wc // ww
    for w in range(nwc):
        img, wloc = divmod(w, nwi)
        wr, wc_ = divmod(wloc, nww_blk)
        owc = ow_ref[w * n:(w + 1) * n, :c].reshape(wh, ww, c)
        if chunked:
            o_ref[0, :, 0, wc_ * ww:(wc_ + 1) * ww, :] = owc
        else:
            o_ref[img, wr * wh:(wr + 1) * wh,
                  wc_ * ww:(wc_ + 1) * ww, :] = owc


def _bwd_kernel(
    qkv_ref,    # (1, wh, 1, Wc, 3C)
    dctx_ref,   # (1, wh, 1, Wc, C)
    bias_ref,   # (heads, N, N) f32
    mask_ref,   # (1, 1, nWc, N, N) f32
    dqkv_ref,   # (1, wh, 1, Wc, 3C)
    dbias_ref,  # (heads, N, N) f32 — accumulated across the whole grid
    wm_ref,     # scratch (nWc*N, 3C)
    dwm_ref,    # scratch (nWc*N, 3C)
    dcw_ref,    # scratch (nWc*N, C)
    s_ref,      # scratch (S_cap, S_cap) f32: scores, then dP
    p_ref,      # scratch (S_cap, N) f32
    dp_ref,     # scratch (S_cap, N) f32
    z_ref,      # scratch (S_cap, S_cap): probs
    z2_ref,     # scratch (S_cap, S_cap): dS
    *,
    wh: int,
    ww: int,
    heads: int,
    chunked: bool,
    masked: bool,
    gcap: int,
):
    if chunked:
        tiles = [qkv_ref[0, :, 0]]
        dtiles = [dctx_ref[0, :, 0]]
    else:
        tiles = [qkv_ref[i] for i in range(qkv_ref.shape[0])]
        dtiles = [dctx_ref[i] for i in range(dctx_ref.shape[0])]
    bp = len(tiles)
    hb, wc, c3 = tiles[0].shape
    c = c3 // 3
    hd = c // heads
    n = wh * ww
    nwi = (hb // wh) * (wc // ww)
    nwc = bp * nwi
    nww_blk = wc // ww
    scale = hd ** -0.5
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    if chunked:
        first = jnp.logical_and(first, pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        z_ref[...] = jnp.zeros_like(z_ref)
        z2_ref[...] = jnp.zeros_like(z2_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for i, t in enumerate(tiles):
        _tile_to_wm(t, wm_ref, wh, ww, c3, base=i * nwi * n)
    for i, t in enumerate(dtiles):
        _tile_to_wm(t, dcw_ref, wh, ww, c, base=i * nwi * n)

    w0 = 0
    # per-image groups: packed programs reuse the proven unpacked
    # score/probs scratch footprint (scoped-vmem stack limit)
    for g in _group_sizes(nwi, n, gcap) * bp:
        s = g * n
        for h in range(heads):
            q = wm_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]
            k = wm_ref[w0 * n:w0 * n + s, c + h * hd:c + (h + 1) * hd]
            v = wm_ref[w0 * n:w0 * n + s, 2 * c + h * hd:2 * c + (h + 1) * hd]
            dctx = dcw_ref[w0 * n:w0 * n + s, h * hd:(h + 1) * hd]

            # recompute probs (same as forward)
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
            if masked:  # see the forward-kernel note
                mall = (mask_ref[0, 0] if chunked
                        else mask_ref[...].reshape(nwi, n, n))
                if bp == 1:
                    blk += mall[w0:w0 + g].reshape(s, n)
                else:
                    blk += jnp.concatenate(
                        [mall[(w0 + j) % nwi] for j in range(g)], axis=0)
            probs = _softmax_rows(blk)
            pz = probs.astype(z_ref.dtype)
            for w in range(g):
                z_ref[w * n:(w + 1) * n, w * n:(w + 1) * n] = (
                    pz[w * n:(w + 1) * n, :]
                )

            # dP (diagonal blocks of dctx @ v^T), softmax VJP, dS
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
            # bias gradient: sum over this group's windows
            dbias_ref[h] += jnp.sum(ds.reshape(g, n, n), axis=0)
            dsz = ds.astype(z2_ref.dtype)
            for w in range(g):
                z2_ref[w * n:(w + 1) * n, w * n:(w + 1) * n] = (
                    dsz[w * n:(w + 1) * n, :]
                )

            # dq = (dS @ k) * scale ; dk = (dS^T @ q) * scale ; dv = P^T @ dctx
            # NOTE an in-place variant (writing dq/dk/dv over the consumed
            # q/k/v columns of wm, dropping this dwm scratch) measured
            # -2% in-step on v5e (29.26 vs 29.91 img/s, 2026-08-20):
            # read-and-write on one ref serializes Mosaic's scheduling.
            # dwm stays input dtype — rounding moves one step earlier;
            # output is bf16 anyway.
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

    for w in range(nwc):
        img, wloc = divmod(w, nwi)
        wr, wc_ = divmod(wloc, nww_blk)
        dq_wc = (dwm_ref[w * n:(w + 1) * n, :].reshape(wh, ww, c3)
                 ).astype(dqkv_ref.dtype)
        if chunked:
            dqkv_ref[0, :, 0, wc_ * ww:(wc_ + 1) * ww, :] = dq_wc
        else:
            dqkv_ref[img, wr * wh:(wr + 1) * wh,
                     wc_ * ww:(wc_ + 1) * ww, :] = dq_wc


def _layout(nww: int, n: int) -> Tuple[int, int]:
    """(windows per program-row, width-chunks per strip)."""
    if nww <= _MAX_BODY_WINDOWS:
        return nww, 1
    g = _chunk_windows(n)
    return g, -(-nww // g)  # wrapper pads nww up to k*g


def _grid_and_specs(b, hp, wp, c3, c, heads, n, wh, ww, pack=True, dt=2,
                    bwd=False, masked=True):
    """Grid + input specs.

    ``k == 1`` (strip fits one program): plain 4D layout, 2D grid — the
    proven fast path.  ``k > 1``: the width-chunk axis becomes its own
    array dimension (5D) because Pallas only allows a block's
    second-to-last dim to be a strict slice when it divides by 8.
    """
    nwh, nww = hp // wh, wp // ww
    g, k = _layout(nww, n)
    assert nww == g * k, (nww, g, k)
    if k == 1:
        bp = _pick_bp(b, heads, nww, n, c3, dt, bwd) if pack else 1
        grid = (b // bp, nwh)
        in_specs = [
            pl.BlockSpec((bp, wh, wp, c3), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, nww, n, n), lambda b_, i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
             if masked else
             pl.BlockSpec((1, 1, n, n), lambda b_, i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ]
        return grid, in_specs, bp * g, k, bp
    grid = (b, nwh, k)
    in_specs = [
        pl.BlockSpec((1, wh, 1, g * ww, c3),
                     lambda b_, i, k_: (b_, i, k_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, n, n), lambda b_, i, k_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, 1, g, n, n), lambda b_, i, k_: (i, k_, 0, 0, 0),
                      memory_space=pltpu.VMEM)
         if masked else
         pl.BlockSpec((1, 1, 1, n, n), lambda b_, i, k_: (0, 0, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
    ]
    return grid, in_specs, g, k, 1


def _scratch(g_total: int, g_img: int, n: int, c3: int, c: int, dtype,
             bwd: bool, gcap: int = 0):
    s_all = g_total * n
    s_cap = min(g_img, max(1, (gcap or _S_CAP) // n)) * n
    if not bwd:
        return [
            pltpu.VMEM((s_all, c3), dtype),
            pltpu.VMEM((s_cap, s_cap), jnp.float32),
            pltpu.VMEM((s_cap, n), jnp.float32),
            pltpu.VMEM((s_cap, s_cap), dtype),
            pltpu.VMEM((s_all, c), dtype),
        ]
    return [
        pltpu.VMEM((s_all, c3), dtype),
        pltpu.VMEM((s_all, c3), dtype),  # dwm (see in-place note in _bwd_kernel)
        pltpu.VMEM((s_all, c), dtype),
        pltpu.VMEM((s_cap, s_cap), jnp.float32),
        pltpu.VMEM((s_cap, n), jnp.float32),
        pltpu.VMEM((s_cap, n), jnp.float32),
        pltpu.VMEM((s_cap, s_cap), dtype),
        pltpu.VMEM((s_cap, s_cap), dtype),
    ]


def _fwd_pallas(qkv, rel_bias, mask, *, wh, ww, heads, masked):
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    n = wh * ww
    grid, in_specs, g, k, bp = _grid_and_specs(
        b, hp, wp, c3, c, heads, n, wh, ww, dt=qkv.dtype.itemsize,
        masked=masked)
    chunked = k > 1
    if chunked:
        qkv_in = qkv.reshape(b, hp, k, g * ww, c3)
        mask_in = (mask.reshape(mask.shape[0], k, g, n, n) if masked
                   else mask.reshape(1, 1, 1, n, n))
        out_shape = jax.ShapeDtypeStruct((b, hp, k, g * ww, c), qkv.dtype)
        out_spec = pl.BlockSpec((1, wh, 1, g * ww, c),
                                lambda b_, i, k_: (b_, i, k_, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        qkv_in, mask_in = qkv, mask
        out_shape = jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype)
        out_spec = pl.BlockSpec((bp, wh, wp, c),
                                lambda b_, i: (b_, i, 0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, wh=wh, ww=ww, heads=heads,
                          chunked=chunked, masked=masked),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=_scratch(g, g // bp, n, c3, c, qkv.dtype,
                                bwd=False),
        interpret=INTERPRET,
    )(qkv_in, rel_bias, mask_in)
    return out.reshape(b, hp, wp, c)


def _bwd_pallas(qkv, dctx, rel_bias, mask, *, wh, ww, heads, masked):
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    n = wh * ww
    nww_s = (wp + (-wp % ww)) // ww
    gcap = _bwd_gcap(min(nww_s, _MAX_BODY_WINDOWS), n, c3,
                     qkv.dtype.itemsize)
    # Backward packing (SSA_ATTN_BWD_PACK=1) is default-OFF: the r5
    # hardware A/B measured it in-step negative (28.71 packed / 29.26
    # in-place-unpacked / 29.91 dwm-unpacked img/s at 512² b8, floors
    # 0.92/0.76/0.99 — BASELINE.md r5) and its Mosaic compile ran 17
    # min vs ~3.  Backward programs are compute-bound, not program-
    # fixed-cost-bound like the small forward bodies.  The dtype-aware
    # bwd scratch bound still gates the env-enabled path; the fwd and
    # bwd grids may differ (the custom_vjp recomputes from saved qkv,
    # so no residual mismatch).
    grid, in_specs, g, k, bp = _grid_and_specs(
        b, hp, wp, c3, c, heads, n, wh, ww,
        pack=os.environ.get("SSA_ATTN_BWD_PACK", "0") == "1",
        dt=qkv.dtype.itemsize, bwd=True, masked=masked)
    chunked = k > 1
    in_specs = list(in_specs)
    if chunked:
        qkv_in = qkv.reshape(b, hp, k, g * ww, c3)
        dctx_in = dctx.reshape(b, hp, k, g * ww, c)
        mask_in = (mask.reshape(mask.shape[0], k, g, n, n) if masked
                   else mask.reshape(1, 1, 1, n, n))
        in_specs.insert(1, pl.BlockSpec((1, wh, 1, g * ww, c),
                                        lambda b_, i, k_: (b_, i, k_, 0, 0),
                                        memory_space=pltpu.VMEM))
        out_shapes = (
            jax.ShapeDtypeStruct((b, hp, k, g * ww, c3), qkv.dtype),
            jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, wh, 1, g * ww, c3),
                         lambda b_, i, k_: (b_, i, k_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda b_, i, k_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        qkv_in, dctx_in, mask_in = qkv, dctx, mask
        in_specs.insert(1, pl.BlockSpec((bp, wh, wp, c),
                                        lambda b_, i: (b_, i, 0, 0),
                                        memory_space=pltpu.VMEM))
        out_shapes = (
            jax.ShapeDtypeStruct((b, hp, wp, c3), qkv.dtype),
            jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((bp, wh, wp, c3),
                         lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    dqkv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, wh=wh, ww=ww, heads=heads,
                          chunked=chunked, masked=masked, gcap=gcap),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=_scratch(g, g // bp, n, c3, c, qkv.dtype,
                                bwd=True, gcap=gcap),
        interpret=INTERPRET,
    )(qkv_in, dctx_in, rel_bias, mask_in)
    return dqkv.reshape(b, hp, wp, c3), dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attn_core(qkv, rel_bias, mask, wh, ww, heads, masked):
    """Window attention on spatial-rolled qkv: ``(B,Hp,Wp,3C)->(B,Hp,Wp,C)``.

    Under ``shard_map`` (data parallelism) the replicated bias table's
    cotangent needs no explicit collective: the shard_map transpose
    psums ``P()`` inputs' cotangents itself (DataParallel semantics,
    reference trainer.py:96-97).
    """
    return _fwd_pallas(qkv, rel_bias, mask, wh=wh, ww=ww, heads=heads,
                       masked=masked)


def _attn_core_fwd(qkv, rel_bias, mask, wh, ww, heads, masked):
    out = _fwd_pallas(qkv, rel_bias, mask, wh=wh, ww=ww, heads=heads,
                      masked=masked)
    return out, (qkv, rel_bias, mask)


def _attn_core_bwd(wh, ww, heads, masked, res, dctx):
    qkv, rel_bias, mask = res
    dqkv, dbias = _bwd_pallas(
        qkv, dctx, rel_bias, mask, wh=wh, ww=ww, heads=heads, masked=masked
    )
    return dqkv, dbias.astype(rel_bias.dtype), jnp.zeros_like(mask)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def _attn_core_sharded(qkv, rel_bias, mask, wh, ww, heads, masked,
                       data_mesh, data_axis):
    """Run ``_attn_core`` per data-parallel shard via ``shard_map``.

    Pallas custom calls have no GSPMD partitioning rule — under a mesh
    the partitioner would otherwise replicate them (full all-gathers of
    the batch-sharded operands).  The kernel grid leads with batch, so
    mapping over the ``data`` axis shards it exactly like the XLA path.
    """
    from jax.sharding import PartitionSpec as P

    n = data_mesh.shape[data_axis]
    if qkv.shape[0] % n:
        # uneven batch (e.g. batch-1 eval on a wide mesh): single-program
        return _attn_core(qkv, rel_bias, mask, wh, ww, heads, masked)
    f = jax.shard_map(
        # custom_vjp nondiff args must ride positionally
        lambda q, b, m: _attn_core(q, b, m, wh, ww, heads, masked),
        mesh=data_mesh,
        in_specs=(P(data_axis), P(), P()),
        out_specs=P(data_axis),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    return f(qkv, rel_bias, mask)


def supported(
    shape: Tuple[int, int, int, int],
    window_size: Tuple[int, int],
    num_heads: int,
    *,
    attention_dropout: float = 0.0,
    deterministic: bool = True,
    dtype=None,
) -> bool:
    """Kernel applicability for a ``(B,H,W,C)`` input.

    ``dtype``: the model compute dtype (None = bf16 deployment).  f32
    models (parity tooling) keep the kernel only on narrow strips: wide
    f32 strips overflow the 16 MB scoped-vmem stack even at 5-window
    score groups (measured 16.68 MB at the 19-window dim-128 strip,
    2026-08-20) — they fall back to the XLA path instead.
    """
    if not deterministic and attention_dropout > 0.0:
        return False  # dropout inside attention stays on the XLA path
    b, h, w, c = shape
    wh, ww = window_size
    n = wh * ww
    if c % num_heads:
        return False
    hd = c // num_heads
    if hd % 8 or hd > 128:
        return False  # lane-slice granularity
    if n > _S_CAP:
        return False
    nww = (w + (-w % ww)) // ww
    if INTERPRET:
        return True  # interpret mode has no scoped-vmem stack
    if dtype is not None and jnp.dtype(dtype).itemsize >= 4 and nww > 5:
        return False  # f32 wide strips: scoped-vmem (see docstring)
    # wide grids fall back to XLA: chunked-kernel 1024² measured slower
    # than the XLA path (4.75 vs 5.32 img/s at b2 — pad windows + program
    # count), and >20-window bodies OOM the remote Mosaic compiler.
    # (Small grids stay on the kernel: gating nww<8 back to XLA measured
    # 26.3 vs 28.0 img/s at 512² — it wins at every supported shape.)
    if nww > _MAX_BODY_WINDOWS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_shifted_window_attention(
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
    data_mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Drop-in fused counterpart of
    :func:`..ops.window_attention.shifted_window_attention` (deterministic
    path).  qkv/proj projections run in XLA (large fusable matmuls); the
    window-shaped middle runs in the Pallas kernel.

    ``data_mesh``: when training data-parallel, pass the mesh so the
    kernel runs per-shard under ``shard_map`` over ``data_axis`` (Pallas
    custom calls are not auto-partitioned by GSPMD); qkv/proj stay in
    XLA where the partitioner handles them.
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

    # wide strips get width-chunked: pad W so every grid program covers
    # the same number of windows (the extra garbage windows are
    # window-local and sliced off before the roll-back; their cotangent
    # is zero so the accumulated bias gradient stays clean)
    nwh, nww = hp // wh, wp // ww
    g, k = _layout(nww, n)
    pad_chunk = (g * k - nww) * ww
    if pad_chunk:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_chunk), (0, 0)))
    nww_p = g * k

    rel_idx = relative_position_index(wh, ww)
    rel_bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, num_heads)
    rel_bias = rel_bias.transpose(2, 0, 1).astype(jnp.float32)

    # built on device from iota (not an np literal): big grids would
    # otherwise inline multi-MB mask constants into the lowered module
    # (see window_attention.shifted_window_mask_dev); XLA constant-folds
    # the computation, so the kernel still receives a materialized array.
    # Unshifted blocks get a (1,1,n,n) dummy and skip the mask in-kernel
    # (masked=False): an all-zero operand folds to a broadcast that
    # Mosaic materializes in scoped vmem — 992K over the 16 MB stack at
    # the 1024² dim-512 strip (2026-08-20).
    if shifted:
        mask = shifted_window_mask_dev(
            hp, wp, wh, ww, sh, sw).reshape(nwh, nww, n, n)
        if nww_p != nww:
            mask = jnp.pad(mask, ((0, 0), (0, nww_p - nww), (0, 0), (0, 0)))
    else:
        mask = jnp.zeros((1, 1, n, n), jnp.float32)

    qkv = jnp.einsum("bhwc,cd->bhwd", x, qkv_kernel.astype(x.dtype))
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(qkv.dtype)

    if data_mesh is not None and data_mesh.shape.get(data_axis, 1) > 1:
        ctx = _attn_core_sharded(qkv, rel_bias, mask, wh, ww, num_heads,
                                 shifted, data_mesh, data_axis)
    else:
        ctx = _attn_core(qkv, rel_bias, mask, wh, ww, num_heads, shifted)

    if pad_chunk:
        ctx = ctx[:, :, :wp, :]
    if shifted:
        ctx = jnp.roll(ctx, shift=(sh, sw), axis=(1, 2))
    if pad_h or pad_w:
        ctx = ctx[:, :h, :w, :]

    out = jnp.einsum("bhwc,cd->bhwd", ctx, proj_kernel.astype(ctx.dtype))
    if proj_bias is not None:
        out = out + proj_bias.astype(out.dtype)
    return out
