"""Patch merge / expand primitives (pure layout ops, NHWC).

These implement the exact channel orderings of the reference model's
``PatchMerging`` (reference ``network/model_parts.py:59-97``),
``PatchExpand`` (``:374-407``) and the ×4 depth-to-space in
``FinalPatchExpand_X4_V2`` (``:437-476``) so that converted PyTorch
checkpoints stay numerically compatible.  They are pure
reshape/transpose — XLA fuses them into the adjacent matmuls for free.
"""

from __future__ import annotations

import jax


def merge_2x2(x: jax.Array) -> jax.Array:
    """``(B, H, W, C) -> (B, H/2, W/2, 4C)``.

    Channel blocks ordered [x0, x1, x2, x3] =
    [(0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)] — the Swin-UNet
    ordering the reference uses (``model_parts.py:87-91``).
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"merge_2x2 needs even H,W; got {h}x{w}")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)  # (b, h2, i, w2, j, c)
    x = x.transpose(0, 1, 3, 4, 2, 5)  # (b, h2, w2, j, i, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array, p: int) -> jax.Array:
    """``(B, H, W, p*p*C) -> (B, p*H, p*W, C)``.

    Channel decomposition is p1-major (einops ``(p1 p2 c)``), matching
    ``rearrange('b h w (p1 p2 c) -> b (h p1) (w p2) c')`` in the reference
    (``model_parts.py:403,464``).
    """
    b, h, w, cpp = x.shape
    if cpp % (p * p):
        raise ValueError(f"channels {cpp} not divisible by {p*p}")
    c = cpp // (p * p)
    x = x.reshape(b, h, w, p, p, c)  # (b, h, w, p1, p2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, p1, w, p2, c)
    return x.reshape(b, h * p, w * p, c)
