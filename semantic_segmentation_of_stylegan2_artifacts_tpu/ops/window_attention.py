"""Shifted-window attention for TPU (XLA path).

Replicates the numerical contract of torchvision's
``shifted_window_attention`` as consumed by the reference MS-UNet
(reference ``network/model_parts.py:36,143-151`` imports
``torchvision.models.swin_transformer.SwinTransformerBlock``):

* pad H,W up to multiples of the window size with zeros (bottom/right),
  applied to the *normed* input; padded tokens participate in non-shifted
  attention (torchvision behavior, reproduced for parity),
* if the window covers the whole padded grid, the shift is dropped,
* cyclic shift by ``-shift`` before window partition, ``+shift`` after,
* fused qkv projection, per-head scaling by ``head_dim**-0.5``,
* relative position bias gathered from a ``(2w-1)^2 × heads`` table by a
  static index, added to logits,
* for shifted blocks an additive 0/-100 mask built from the 9-region
  partition of the padded grid,
* softmax (computed in float32), optional attention dropout, output
  projection, optional projection dropout.

TPU-first design notes: everything here is static-shaped; the mask and the
relative-position index are plain numpy constants baked into the jaxpr, so
XLA folds them.  The attention itself is a batched (windows × heads) matmul
over 49-token windows — MXU-friendly and fully fusable.  A Pallas fused
kernel with the same signature lives in ``ops/fused_window_attention.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Static (trace-time) constants
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static ``(wh*ww, wh*ww)`` gather index into the (2wh-1)(2ww-1) table.

    Same construction as torchvision/Swin: pairwise coordinate deltas,
    shifted to be non-negative, row-major flattened.
    """
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # 2,wh,ww
    coords_flat = coords.reshape(2, -1)  # 2, N
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, N, N
    relative = relative.transpose(1, 2, 0).astype(np.int64)  # N, N, 2
    relative[:, :, 0] += wh - 1
    relative[:, :, 1] += ww - 1
    relative[:, :, 0] *= 2 * ww - 1
    return relative.sum(-1)  # N, N


@functools.lru_cache(maxsize=None)
def shifted_window_mask(
    pad_h: int, pad_w: int, wh: int, ww: int, sh: int, sw: int
) -> np.ndarray:
    """Static additive mask ``(num_windows, N, N)`` with 0 / -100 entries.

    Built exactly like torchvision: label the padded grid with 9 region ids
    from the (window, shift) slicing, partition into windows, mask pairs
    with different ids.
    """
    img = np.zeros((pad_h, pad_w), dtype=np.float32)
    h_slices = ((0, pad_h - wh), (pad_h - wh, pad_h - sh), (pad_h - sh, pad_h))
    w_slices = ((0, pad_w - ww), (pad_w - ww, pad_w - sw), (pad_w - sw, pad_w))
    cnt = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            img[h0:h1, w0:w1] = cnt
            cnt += 1
    img = img.reshape(pad_h // wh, wh, pad_w // ww, ww)
    img = img.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # nW, N
    mask = img[:, None, :] - img[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def shifted_window_mask_dev(
    pad_h: int, pad_w: int, wh: int, ww: int, sh: int, sw: int
) -> jax.Array:
    """:func:`shifted_window_mask` built from on-device iota (same values).

    The np version embeds an ``(nW, N, N)`` f32 literal in the lowered
    module — 13.1 MB at the 1024² stage-0 grid (1369 windows) — and
    remat duplicates the consumer, which is what pushed the
    1024²+high_res+fused-patch module to the 19.9 MB MLIR that SIGKILLed
    the remote compile helper (BASELINE.md r4).  Iota math keeps the
    module small; XLA constant-folds it at compile time, so the runtime
    cost is identical.
    """
    hi = jax.lax.broadcasted_iota(jnp.int32, (pad_h, pad_w), 0)
    wi = jax.lax.broadcasted_iota(jnp.int32, (pad_h, pad_w), 1)
    # region ids 0/1/2 per axis, exactly the np version's three slices
    # ((0, pad-w), (pad-w, pad-s), (pad-s, pad)); with s=0 the third
    # region is empty (iota never reaches pad_h)
    rh = (hi >= pad_h - wh).astype(jnp.int32) + (hi >= pad_h - sh)
    rw = (wi >= pad_w - ww).astype(jnp.int32) + (wi >= pad_w - sw)
    img = 3 * rh + rw
    img = img.reshape(pad_h // wh, wh, pad_w // ww, ww)
    img = img.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # nW, N
    diff = img[:, None, :] - img[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


# --------------------------------------------------------------------------
# Window partition / reverse (NHWC)
# --------------------------------------------------------------------------
def window_partition(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """``(B, H, W, C) -> (B, nW, wh*ww, C)`` with H,W multiples of window."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // wh) * (w // ww), wh * ww, c)


def window_reverse(x: jax.Array, h: int, w: int, wh: int, ww: int) -> jax.Array:
    """``(B, nW, wh*ww, C) -> (B, H, W, C)``."""
    b, nw, n, c = x.shape
    x = x.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# --------------------------------------------------------------------------
# Held window-major layout (per-stage relayout elision)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def real_token_mask(
    h: int, w: int, hp: int, wp: int, wh: int, ww: int, sh: int, sw: int
) -> Optional[np.ndarray]:
    """Static ``(nW, N, 1)`` float mask: 1 at real tokens, 0 at pad tokens,
    in the window-major layout obtained by pad -> roll(-s) -> partition.

    Used by the held-layout block path to zero the *normed* input at pad
    positions before attention — numerically identical to the spatial
    path, which zero-pads the normed map (torchvision semantics).
    Returns None when the grid needs no padding.
    """
    if hp == h and wp == w:
        return None
    real = np.zeros((hp, wp), np.float32)
    real[:h, :w] = 1.0
    if sh or sw:
        real = np.roll(real, (-sh, -sw), axis=(0, 1))
    real = real.reshape(hp // wh, wh, wp // ww, ww)
    real = real.transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    return real[:, :, None]  # (nW, N, 1)


def spatial_to_window(
    x: jax.Array, wh: int, ww: int, sh: int, sw: int
) -> jax.Array:
    """``(B, H, W, C)`` -> window-major ``(B, nW, N, C)`` (pad, roll, part)."""
    b, h, w, c = x.shape
    pad_h, pad_w = -h % wh, -w % ww
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    if sh or sw:
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
    return window_partition(x, wh, ww)


def window_to_spatial(
    xw: jax.Array, h: int, w: int, wh: int, ww: int, sh: int, sw: int
) -> jax.Array:
    """Inverse of :func:`spatial_to_window` (reverse, unroll, slice)."""
    hp, wp = h + (-h % wh), w + (-w % ww)
    x = window_reverse(xw, hp, wp, wh, ww)
    if sh or sw:
        x = jnp.roll(x, shift=(sh, sw), axis=(1, 2))
    if hp != h or wp != w:
        x = x[:, :h, :w, :]
    return x


def relayout_windows(
    xw: jax.Array,
    h: int,
    w: int,
    wh: int,
    ww: int,
    from_shift: Tuple[int, int],
    to_shift: Tuple[int, int],
) -> jax.Array:
    """Move a window-major map from one shift layout to another.

    One reverse + roll + partition (values at pad positions travel along;
    they are masked out before each attention anyway).  Replaces the
    per-block pad/roll/partition/reverse/roll/slice chain of the spatial
    path — the layout-op halving from docs/ROADMAP.md P0.1.
    """
    if from_shift == to_shift:
        return xw
    hp, wp = h + (-h % wh), w + (-w % ww)
    x = window_reverse(xw, hp, wp, wh, ww)
    dh = from_shift[0] - to_shift[0]
    dw = from_shift[1] - to_shift[1]
    x = jnp.roll(x, shift=(dh, dw), axis=(1, 2))
    return window_partition(x, wh, ww)


# --------------------------------------------------------------------------
# Window grouping (TPU batched-matmul efficiency)
# --------------------------------------------------------------------------
def pick_window_group(n_win: int) -> int:
    """Default windows-per-group for :func:`shifted_window_attention`.

    Grouping ``G`` windows along the sequence axis turns ``G`` tiny
    attention-matmul instances into one ``(G*49, ...)`` matmul with
    cross-window pairs masked additively.  Measured on v5e (r2 sweep,
    G in {1,4,5,7,8,16} at every 512^2 stage shape): grouping LOSES —
    the score matrix grows G-fold in HBM and the op is bandwidth-bound
    there, so G=1 is fastest at every shape.  Auto therefore means
    "no grouping"; the knob (``TPU.ATTN_WINDOW_GROUP``) remains for
    hardware where instance overhead dominates instead.
    """
    del n_win
    return 1


def _grouped_attention(
    q: jax.Array,  # (B, nWp, N, H, hd) scaled queries
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,  # (H, N, N)
    shift_mask: Optional[np.ndarray],  # (nW, N, N) or None
    *,
    group: int,
    n_win: int,  # real window count (nWp = padded, multiple of group)
    softmax_dtype: jnp.dtype,
    attention_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Window-grouped attention core; returns ctx ``(B, nWp, N, H, hd)``.

    Exact on real-window token pairs: cross-window and dummy-window
    logits get additive ``-100`` (the same masking constant torchvision
    uses for its shifted windows), so their softmax weight underflows to
    ~0 exactly as the reference's own masked pairs do.
    """
    b, nwp, n, h, hd = q.shape
    g = group
    s = nwp // g

    def to_super(t):  # (B, nWp, N, H, hd) -> (B, S, H, G*N, hd)
        t = t.reshape(b, s, g * n, h, hd)
        return t.transpose(0, 1, 3, 2, 4)

    qg, kg, vg = to_super(q), to_super(k), to_super(v)
    attn = jnp.einsum(
        "bshnd,bshmd->bshnm", qg, kg, preferred_element_type=softmax_dtype
    ).astype(softmax_dtype)
    # view as (B, S, H, G, N, G', N') — contiguous reshape, free
    attn = attn.reshape(b, s, h, g, n, g, n)

    # within-window relative-position bias, broadcast over (g, g') blocks;
    # off-diagonal blocks are masked below so the broadcast is harmless
    attn = attn + rel_bias[None, None, :, None, :, None, :].astype(softmax_dtype)

    # block-diagonal mask: -100 between different windows of a group
    eye = np.eye(g, dtype=np.float32)
    bd = ((1.0 - eye) * -100.0).reshape(1, 1, 1, g, 1, g, 1)
    attn = attn + jnp.asarray(bd, softmax_dtype)

    # per-window shift mask (broadcast over the key-side g' axis: only the
    # g==g' block survives the block-diagonal mask anyway).  np masks are
    # normalized to jnp so big grids never inline an (nW, N, N) literal
    # into the module (see shifted_window_mask_dev).
    if shift_mask is not None:
        sm = jnp.asarray(shift_mask, softmax_dtype)
        if nwp != n_win:
            sm = jnp.pad(sm, ((0, nwp - n_win), (0, 0), (0, 0)))
        sm = sm.reshape(1, s, 1, g, n, 1, n)
        attn = attn + sm

    # dummy-window keys (window index >= n_win) masked for every query
    if nwp != n_win:
        col = np.zeros((nwp, 1, n), np.float32)
        col[n_win:] = -100.0
        col = col.reshape(1, s, 1, 1, 1, g, n)
        attn = attn + jnp.asarray(col, softmax_dtype)

    attn = attn.reshape(b, s, h, g * n, g * n)
    attn = jax.nn.softmax(attn, axis=-1)

    if not deterministic and attention_dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for attention dropout")
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - attention_dropout, attn.shape
        )
        attn = jnp.where(keep, attn / (1.0 - attention_dropout), 0.0)

    ctx = jnp.einsum("bshnm,bshmd->bshnd", attn.astype(vg.dtype), vg)
    ctx = ctx.transpose(0, 1, 3, 2, 4).reshape(b, nwp, n, h, hd)
    return ctx


# --------------------------------------------------------------------------
# The attention op
# --------------------------------------------------------------------------
def shifted_window_attention(
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
    attention_dropout: float = 0.0,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    softmax_dtype: jnp.dtype = jnp.float32,
    window_group: Optional[int] = None,
) -> jax.Array:
    """Shifted-window multi-head self attention on an NHWC feature map.

    Args:
      x: ``(B, H, W, C)`` feature map (already normed by the caller).
      qkv_kernel: ``(C, 3C)`` fused qkv projection (JAX layout: in × out).
      qkv_bias: ``(3C,)`` or None.
      proj_kernel: ``(C, C)``.
      proj_bias: ``(C,)`` or None.
      bias_table: ``((2wh-1)(2ww-1), heads)`` relative position bias table.
      window_size / shift_size: static ints per block.
      deterministic: disables both dropouts when True.
      window_group: windows fused per attention matmul instance
        (None = auto via :func:`pick_window_group`; 1 = one matmul
        instance per window, the layout torchvision uses).  Grouping
        changes only masked (cross-window) logits, which underflow to
        zero weight — real-pair numerics are unchanged.

    Returns ``(B, H, W, C)``.
    """
    b, h, w, c = x.shape
    wh, ww = window_size
    sh, sw = shift_size

    pad_h = -h % wh
    pad_w = -w % ww
    hp, wp = h + pad_h, w + pad_w

    # torchvision: drop the shift if one window spans the padded grid
    if wh >= hp:
        sh = 0
    if ww >= wp:
        sw = 0
    shifted = (sh + sw) > 0

    xw = spatial_to_window(x, wh, ww, sh, sw)  # (B, nW, N, C)
    mask_np = (shifted_window_mask_dev(hp, wp, wh, ww, sh, sw)
               if shifted else None)

    out = window_attention_core(
        xw, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
        window_size=window_size, num_heads=num_heads, mask_np=mask_np,
        attention_dropout=attention_dropout, dropout=dropout,
        dropout_rng=dropout_rng, deterministic=deterministic,
        softmax_dtype=softmax_dtype, window_group=window_group,
    )
    return window_to_spatial(out, h, w, wh, ww, sh, sw)


def window_attention_core(
    xw: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array],
    bias_table: jax.Array,
    *,
    window_size: Tuple[int, int],
    num_heads: int,
    mask_np: Optional[np.ndarray] = None,
    attention_dropout: float = 0.0,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    softmax_dtype: jnp.dtype = jnp.float32,
    window_group: Optional[int] = None,
) -> jax.Array:
    """Attention on an already window-major map ``(B, nW, N, C)``.

    ``mask_np`` is the static per-window additive mask (from
    :func:`shifted_window_mask`) or None for unshifted blocks.  This is
    the compute core shared by the spatial op and the held-layout block
    path (``models/layers.py``).
    """
    b, n_win, n_tok, c = xw.shape
    wh, ww = window_size
    head_dim = c // num_heads

    qkv = jnp.einsum("bwnc,cd->bwnd", xw, qkv_kernel.astype(xw.dtype))
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(qkv.dtype)
    qkv = qkv.reshape(b, n_win, n_tok, 3, num_heads, head_dim)

    rel_idx = relative_position_index(wh, ww)  # static numpy (N, N)
    rel_bias = bias_table[rel_idx.reshape(-1)].reshape(n_tok, n_tok, num_heads)
    rel_bias = rel_bias.transpose(2, 0, 1)  # heads, N, N

    group = window_group if window_group is not None else pick_window_group(n_win)
    group = max(1, min(group, n_win))

    attn_rng = None
    if not deterministic and attention_dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for attention dropout")
        dropout_rng, attn_rng = jax.random.split(dropout_rng)

    if group > 1:
        q = qkv[..., 0, :, :] * (head_dim**-0.5)  # (B, nW, N, H, hd)
        k = qkv[..., 1, :, :]
        v = qkv[..., 2, :, :]
        pad_win = -n_win % group
        if pad_win:
            wpad = ((0, 0), (0, pad_win), (0, 0), (0, 0), (0, 0))
            q, k, v = jnp.pad(q, wpad), jnp.pad(k, wpad), jnp.pad(v, wpad)
        ctx = _grouped_attention(
            q, k, v, rel_bias, mask_np,
            group=group, n_win=n_win, softmax_dtype=softmax_dtype,
            attention_dropout=attention_dropout, dropout_rng=attn_rng,
            deterministic=deterministic,
        )
        if pad_win:
            ctx = ctx[:, :n_win]
        out = ctx.reshape(b, n_win, n_tok, c)
    else:
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # -> (B, nW, heads, N, head_dim)
        q = q.transpose(0, 1, 3, 2, 4) * (head_dim**-0.5)
        k = k.transpose(0, 1, 3, 2, 4)
        v = v.transpose(0, 1, 3, 2, 4)

        attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k).astype(softmax_dtype)
        attn = attn + rel_bias[None, None].astype(softmax_dtype)

        if mask_np is not None:
            mask = jnp.asarray(mask_np)
            attn = attn + mask[None, :, None].astype(softmax_dtype)

        attn = jax.nn.softmax(attn, axis=-1)

        if attn_rng is not None:
            keep = jax.random.bernoulli(
                attn_rng, 1.0 - attention_dropout, attn.shape
            )
            attn = jnp.where(keep, attn / (1.0 - attention_dropout), 0.0)

        out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, n_win, n_tok, c)
    out = jnp.einsum("bwnc,cd->bwnd", out, proj_kernel.astype(out.dtype))
    if proj_bias is not None:
        out = out + proj_bias.astype(out.dtype)

    if not deterministic and dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for projection dropout")
        _, sub = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout), 0.0)

    return out
