"""Window-attention parity vs an independent numpy oracle.

The oracle below re-derives the torchvision ``shifted_window_attention``
semantics with plain loops (no shared code with the op under test): pad ->
(maybe drop shift) -> roll -> per-window per-head attention with relative
position bias and the 9-region shift mask -> unroll -> unpad.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.ops.window_attention import (
    relative_position_index,
    shifted_window_attention,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_attention(x, qkv_k, qkv_b, proj_k, proj_b, table, w, s, heads):
    """Loop-based oracle. x: (B,H,W,C). Returns (B,H,W,C), float64."""
    b, h0, w0, c = x.shape
    hd = c // heads
    pad_h = (-h0) % w
    pad_w = (-w0) % w
    hp, wp = h0 + pad_h, w0 + pad_w
    xp = np.zeros((b, hp, wp, c))
    xp[:, :h0, :w0] = x
    sh = sw = s
    if w >= hp:
        sh = 0
    if w >= wp:
        sw = 0
    if sh or sw:
        xp = np.roll(xp, (-sh, -sw), axis=(1, 2))

    # region ids for mask
    region = np.zeros((hp, wp))
    if sh or sw:
        cnt = 0
        for h_sl in [(0, hp - w), (hp - w, hp - sh), (hp - sh, hp)]:
            for w_sl in [(0, wp - w), (wp - w, wp - sw), (wp - sw, wp)]:
                region[h_sl[0]:h_sl[1], w_sl[0]:w_sl[1]] = cnt
                cnt += 1

    # relative position bias (N,N,heads) by explicit coords
    n = w * w
    bias = np.zeros((heads, n, n))
    for i in range(n):
        for j in range(n):
            di = i // w - j // w + (w - 1)
            dj = i % w - j % w + (w - 1)
            bias[:, i, j] = table[di * (2 * w - 1) + dj]

    out = np.zeros_like(xp)
    for bi in range(b):
        for wi in range(hp // w):
            for wj in range(wp // w):
                tile = xp[bi, wi * w:(wi + 1) * w, wj * w:(wj + 1) * w, :]
                tok = tile.reshape(n, c)
                reg = region[wi * w:(wi + 1) * w, wj * w:(wj + 1) * w].reshape(n)
                qkv = tok @ qkv_k + qkv_b  # (n, 3c)
                q, k, v = qkv[:, :c], qkv[:, c:2 * c], qkv[:, 2 * c:]
                acc = np.zeros((n, c))
                for hh in range(heads):
                    qh = q[:, hh * hd:(hh + 1) * hd] * hd ** -0.5
                    kh = k[:, hh * hd:(hh + 1) * hd]
                    vh = v[:, hh * hd:(hh + 1) * hd]
                    logits = qh @ kh.T + bias[hh]
                    if sh or sw:
                        mask = np.where(reg[None, :] != reg[:, None], -100.0, 0.0)
                        logits = logits + mask
                    att = _softmax(logits)
                    acc[:, hh * hd:(hh + 1) * hd] = att @ vh
                o = acc @ proj_k + proj_b
                out[bi, wi * w:(wi + 1) * w, wj * w:(wj + 1) * w, :] = o.reshape(w, w, c)

    if sh or sw:
        out = np.roll(out, (sh, sw), axis=(1, 2))
    return out[:, :h0, :w0, :]


@pytest.mark.parametrize(
    "h,w0,win,shift",
    [
        (8, 8, 4, 0),     # divisible, no shift
        (8, 8, 4, 2),     # divisible, shifted
        (9, 10, 4, 2),    # padded, shifted
        (9, 10, 4, 0),    # padded, no shift (padded tokens attend: parity)
        (3, 3, 4, 2),     # window larger than grid -> shift dropped
        (6, 13, 7, 3),    # reference window size, padded both dims
        (15, 15, 5, 2),   # window 5, exact grid, shifted
        (10, 21, 5, 1),   # asymmetric grid, small shift
        (7, 7, 7, 3),     # single window == grid -> shift dropped
        (32, 32, 7, 3),   # stage-3-like grid at 1024² (pad 32->35)
    ],
)
def test_matches_oracle(h, w0, win, shift):
    rng = np.random.RandomState(h * 100 + w0 * 10 + win + shift)
    c, heads = 8, 2
    x = rng.randn(2, h, w0, c).astype(np.float32)
    qkv_k = (rng.randn(c, 3 * c) * 0.1).astype(np.float32)
    qkv_b = (rng.randn(3 * c) * 0.1).astype(np.float32)
    proj_k = (rng.randn(c, c) * 0.1).astype(np.float32)
    proj_b = (rng.randn(c) * 0.1).astype(np.float32)
    table = (rng.randn((2 * win - 1) ** 2, heads) * 0.1).astype(np.float32)

    want = oracle_attention(
        x.astype(np.float64), qkv_k, qkv_b, proj_k, proj_b, table, win, shift, heads
    )
    got = shifted_window_attention(
        jnp.asarray(x),
        jnp.asarray(qkv_k),
        jnp.asarray(qkv_b),
        jnp.asarray(proj_k),
        jnp.asarray(proj_b),
        jnp.asarray(table),
        window_size=(win, win),
        shift_size=(shift, shift),
        num_heads=heads,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 12 * 3, dtype=jnp.float32).reshape(2, 8, 12, 3)
    w = window_partition(x, 4, 4)
    assert w.shape == (2, 2 * 3, 16, 3)
    back = window_reverse(w, 8, 12, 4, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_static():
    idx = relative_position_index(7, 7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 169
    # center-symmetric: idx[i,j] + idx[j,i] pairs map to mirrored offsets
    assert idx[0, 0] == idx[48, 48]


def test_shift_mask_blocks():
    mask = shifted_window_mask(8, 8, 4, 4, 2, 2)
    assert mask.shape == (4, 16, 16)
    # first window (interior) has no masking
    assert np.all(mask[0] == 0)
    # wrapped windows mask some pairs
    assert np.any(mask[-1] == -100.0)


def test_gradients_flow():
    c, heads, win = 8, 2, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (1, 6, 6, c))
    args = [
        jax.random.normal(ks[1], (c, 3 * c)) * 0.1,
        jax.random.normal(ks[2], (3 * c,)) * 0.1,
        jax.random.normal(ks[3], (c, c)) * 0.1,
        jax.random.normal(ks[4], (c,)) * 0.1,
        jax.random.normal(ks[5], ((2 * win - 1) ** 2, heads)) * 0.1,
    ]

    def loss(x, *a):
        out = shifted_window_attention(
            x, *a, window_size=(win, win), shift_size=(2, 2), num_heads=heads
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=tuple(range(6)))(x, *args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("grid,shift", [((16, 16), 0), ((16, 16), 3),
                                        ((19, 19), 3), ((10, 12), 3),
                                        ((7, 7), 3)])
@pytest.mark.parametrize("group", [2, 4, 8])
def test_window_grouping_matches_ungrouped(grid, shift, group):
    """TPU.ATTN_WINDOW_GROUP fuses windows per matmul instance; real
    token-pair numerics must match the per-window layout exactly (the
    cross-window -100 masking mirrors torchvision's own shifted-window
    masking constant)."""
    h, w = grid
    c, heads = 32, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (2, h, w, c))
    args = [
        jax.random.normal(ks[1], (c, 3 * c)) * 0.1,
        jax.random.normal(ks[2], (3 * c,)) * 0.1,
        jax.random.normal(ks[3], (c, c)) * 0.1,
        jax.random.normal(ks[4], (c,)) * 0.1,
        jax.random.normal(ks[5], (169, heads)) * 0.1,
    ]
    kw = dict(window_size=(7, 7), shift_size=(shift, shift), num_heads=heads)
    ref = shifted_window_attention(x, *args, window_group=1, **kw)
    out = shifted_window_attention(x, *args, window_group=group, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_window_group_gradients_flow():
    c, heads = 32, 4
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (1, 16, 16, c))
    args = [
        jax.random.normal(ks[1], (c, 3 * c)) * 0.1,
        jax.random.normal(ks[2], (3 * c,)) * 0.1,
        jax.random.normal(ks[3], (c, c)) * 0.1,
        jax.random.normal(ks[4], (c,)) * 0.1,
        jax.random.normal(ks[5], (169, heads)) * 0.1,
    ]

    def loss(x, *a):
        out = shifted_window_attention(
            x, *a, window_size=(7, 7), shift_size=(3, 3), num_heads=heads,
            window_group=8,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1))(x, *args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


def test_shifted_window_mask_dev_matches_np():
    """The on-device (iota) mask equals the numpy oracle at every shape
    class: divisible, padded, zero-shift-on-one-axis, and the wide
    1024²-stage-1-like grid whose np literal motivated the dev version
    (multi-MB MLIR constants, BASELINE.md r4 compile SIGKILL)."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.ops.window_attention import (
        shifted_window_mask_dev,
    )

    cases = [
        (14, 14, 7, 7, 3, 3),
        (21, 21, 7, 7, 3, 3),   # padded 16->21 grid
        (21, 28, 7, 7, 3, 0),   # shift only on H
        (10, 15, 5, 5, 2, 2),
        (133, 133, 7, 7, 3, 3),  # 19x19 windows (1024² stage-1 grid)
    ]
    for ph, pw, wh, ww, sh, sw in cases:
        want = shifted_window_mask(ph, pw, wh, ww, sh, sw)
        got = np.asarray(shifted_window_mask_dev(ph, pw, wh, ww, sh, sw))
        np.testing.assert_array_equal(got, want, err_msg=str(
            (ph, pw, wh, ww, sh, sw)))
