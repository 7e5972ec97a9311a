"""Fused PatchMerging / PatchExpand Pallas kernels (relayout + LN + Linear).

Why: after the r3 MLP/whole-block fusions, the next unfused HBM byte
streams in the 512² train step are the patch relayouts (VERDICT r3 task
5).  On the XLA path each ``PatchMerging`` (reference
``network/model_parts.py:59-97``) materializes the 2×2 space-to-depth
transpose as its own HBM relayout pass before the LN+Linear pair, and
each ``PatchExpand`` (``model_parts.py:374-407``) materializes the
2C-wide Linear output AND the depth-to-space transpose before the LN —
pure bandwidth on tensors that carry no reuse.  The backward doubles the
traffic and additionally saves the merged/expanded intermediates.

These kernels do the relayout *in VMEM* between the residual-stream
reads/writes:

* ``fused_patch_merge``: read ``(B,H,W,C)`` once (as a free 4D reshape
  ``(B·H/2, 2, W/2, 2C)`` — splitting contiguous dims moves no data; the
  column pair rides the lane axis), build the ``[x0|x1|x2|x3]`` 4C
  concat from 128-aligned lane slices, LayerNorm (f32 stats), matmul
  with the VMEM-resident ``reduction`` weight, write ``(B·H/2, W/2, 2C)``
  once.  The Swin-UNet channel order matches ``ops/patch_ops.merge_2x2``.
* ``fused_patch_expand``: read ``(B·H, W, C)`` once, matmul with the
  VMEM-resident ``expand`` weight, split channels ``(p1 p2 c)``
  (einops order, ``patch_ops.depth_to_space``), LayerNorm each C/2
  group, concat the four groups into an ``(B·H, 2, W, C)`` output whose
  reshape to ``(B, 2H, 2W, C/2)`` is again free.

All refs are rank <= 4 and every interleave is a lane-axis slice/concat
at 128-aligned offsets: the original rank-5 layout (row/column pairs as
their own size-2 axes, scatter stores like ``o_ref[:, 0, :, 0, :]``)
lowered fine but crashed the Mosaic binary compiler on hardware
(tpu_compile_helper exit 1 at every shape, r4 triage 05:07).

Both backwards are flash-style: only ``x`` is saved (the residual/skip
stream keeps it alive anyway); LN stats are recomputed per tile and the
weight/LN-parameter gradients are accumulated across the sequential TPU
grid into constant-index f32 blocks (same pattern as the
bias-table gradient in ``fused_window_attention._bwd_kernel``).

Grid = row tiles of the collapsed leading ``B·H/2`` (merge) / ``B·H``
(expand) axis; a full output row (W/2·4C resp. W·2C elements) stays
under ~1 MB for every instance of the flagship model because the MS-UNet
halves the grid exactly when it doubles C.  Numerics match the XLA
modules (``models/layers.py::PatchMerging/PatchExpand``) to input-dtype
rounding; asserted in ``tests/test_fused_patch.py`` (interpret mode).
Gated by ``TPU.FUSED_PATCH`` + shape/backend support.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

_LN_EPS = 1e-5  # torch nn.LayerNorm epsilon (models/layers.py::LN_EPS)

# widest channel dim whose Linear weight (+ f32 grad accumulator) stays
# VMEM-resident: merge C=512 -> (2048,1024) = 4 MB bf16 + 8 MB f32 dW;
# expand C=1024 -> (1024,2048), same bytes.  Covers every instance in
# the flagship MS-UNet.  SSA_FUSED_PATCH_DIM_CAP lowers it per-run for
# stage-by-stage hardware triage.
_MERGE_DIM_CAP = 512
_EXPAND_DIM_CAP = 1024

# per-tile f32 temporary budget (bytes) used to pick the row-tile size
_TILE_BUDGET = 4 * 2**20


def _env_cap(default: int) -> int:
    try:
        return min(default, int(os.environ.get("SSA_FUSED_PATCH_DIM_CAP",
                                               default)))
    except ValueError:  # pragma: no cover
        return default


def _mm(a, b, dims, out_dtype=None):
    out = jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    return out if out_dtype is None else out.astype(out_dtype)


def _ln_stats(xf):
    """f32 fast-variance LayerNorm stats over the last axis."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    rsig = jax.lax.rsqrt(var + _LN_EPS)
    return (xf - mean) * rsig, rsig


def _ln_bwd(dn, xhat, rsig, scale):
    """flax LayerNorm VJP (f32): input cotangent from normed cotangent."""
    dxh = dn * scale
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return (dxh - m1 - xhat * m2) * rsig


def _row_tile(rows: int, row_elems: int) -> int:
    """Row-tile size bounding ~4 f32 row-sized temporaries to the budget."""
    tr = max(1, _TILE_BUDGET // max(1, 16 * row_elems))
    return min(tr, rows)


def _pad_rows(x: jax.Array, tr: int) -> jax.Array:
    pad = -x.shape[0] % tr
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _row_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# PatchMerging: x4 (R, 2, W2, 2C) -> out (R, W2, 2C)
#
# The input rides as rank-4 with the column-pair fused into the lane dim
# ((B,H,W,C) -> (B·H/2, 2, W/2, 2C) is a free reshape): rank-5 refs with
# strided middle-axis scatter stores crashed the Mosaic binary compiler
# in the r4 hardware triage (tpu_compile_helper exit 1 at every shape),
# while every hardware-proven kernel in this suite uses <=4D refs whose
# interleaving is lane-dim slicing at 128-aligned offsets (C % 128 == 0
# is gated by merge_supported/expand_supported).
# ---------------------------------------------------------------------------


def _merged_4c(x4_blk, c):
    """(TR, 2, W2, 2C) -> (TR*W2, 4C) in merge_2x2 channel order."""
    r02 = x4_blk[:, 0]  # (TR, W2, 2C): [x0 | x2] along lanes
    r13 = x4_blk[:, 1]  # (TR, W2, 2C): [x1 | x3]
    m = jnp.concatenate(
        (r02[..., :c], r13[..., :c], r02[..., c:], r13[..., c:]), axis=-1
    )  # (TR, W2, 4C)
    tr, w2, c4 = m.shape
    return m.reshape(tr * w2, c4)


def _merge_fwd_kernel(x4_ref, sc_ref, lb_ref, w_ref, o_ref):
    tr, w2, c2 = o_ref.shape
    m = _merged_4c(x4_ref[...], c2 // 2)
    xhat, _ = _ln_stats(m.astype(jnp.float32))
    n = (xhat * sc_ref[0][None] + lb_ref[0][None]).astype(m.dtype)
    y = _mm(n, w_ref[...], (((1,), (0,))), m.dtype)
    o_ref[...] = y.reshape(tr, w2, c2)


def _merge_bwd_kernel(
    x4_ref,    # (TR, 2, W2, 2C)
    dy_ref,    # (TR, W2, 2C)
    sc_ref,    # (1, 4C) f32
    lb_ref,    # (1, 4C) f32
    w_ref,     # (4C, 2C)
    dx4_ref,   # (TR, 2, W2, 2C)
    dw_ref,    # (4C, 2C) f32 — accumulated across the grid
    dsc_ref,   # (1, 4C) f32
    dlb_ref,   # (1, 4C) f32
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    tr, w2, c2 = dy_ref.shape
    c = c2 // 2
    scale = sc_ref[0][None]

    m = _merged_4c(x4_ref[...], c)
    xhat, rsig = _ln_stats(m.astype(jnp.float32))
    n = (xhat * scale + lb_ref[0][None]).astype(m.dtype)

    dy = dy_ref[...].reshape(tr * w2, c2)
    dw_ref[...] += _mm(n, dy, (((0,), (0,))))
    dn = _mm(dy, w_ref[...], (((1,), (1,))), m.dtype).astype(jnp.float32)
    dsc_ref[...] += jnp.sum(dn * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dn, axis=0, keepdims=True)
    dm = _ln_bwd(dn, xhat, rsig, scale).astype(dx4_ref.dtype)
    dm = dm.reshape(tr, w2, 4 * c)
    # inverse of _merged_4c: [dx0|dx1|dx2|dx3] -> row-pair x lane-pair
    dx4_ref[:, 0] = jnp.concatenate(
        (dm[..., 0 * c:1 * c], dm[..., 2 * c:3 * c]), axis=-1)
    dx4_ref[:, 1] = jnp.concatenate(
        (dm[..., 1 * c:2 * c], dm[..., 3 * c:4 * c]), axis=-1)


def _merge_fwd_pallas(x4, sc, lb, w):
    r, _, w2, c2 = x4.shape
    c = c2 // 2
    tr = _row_tile(r, w2 * 4 * c)
    xp = _pad_rows(x4, tr)
    grid = (xp.shape[0] // tr,)
    out = pl.pallas_call(
        _merge_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], w2, 2 * c), x4.dtype),
        grid=grid,
        in_specs=[
            _row_spec((tr, 2, w2, 2 * c)),
            _const_spec((1, 4 * c)), _const_spec((1, 4 * c)),
            _const_spec((4 * c, 2 * c)),
        ],
        out_specs=_row_spec((tr, w2, 2 * c)),
        interpret=INTERPRET,
    )(xp, sc[None], lb[None], w)
    return out[:r]


def _merge_bwd_pallas(x4, dy, sc, lb, w):
    r, _, w2, c2 = x4.shape
    c = c2 // 2
    tr = _row_tile(r, w2 * 4 * c)
    xp = _pad_rows(x4, tr)
    dyp = _pad_rows(dy, tr)
    grid = (xp.shape[0] // tr,)
    f32 = jnp.float32
    dx4, dw, dsc, dlb = pl.pallas_call(
        _merge_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x4.dtype),
            jax.ShapeDtypeStruct((4 * c, 2 * c), f32),
            jax.ShapeDtypeStruct((1, 4 * c), f32),
            jax.ShapeDtypeStruct((1, 4 * c), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec((tr, 2, w2, 2 * c)),
            _row_spec((tr, w2, 2 * c)),
            _const_spec((1, 4 * c)), _const_spec((1, 4 * c)),
            _const_spec((4 * c, 2 * c)),
        ],
        out_specs=(
            _row_spec((tr, 2, w2, 2 * c)),
            _const_spec((4 * c, 2 * c)),
            _const_spec((1, 4 * c)), _const_spec((1, 4 * c)),
        ),
        interpret=INTERPRET,
    )(xp, dyp, sc[None], lb[None], w)
    return dx4[:r], dw, dsc[0], dlb[0]


@functools.partial(jax.custom_vjp)
def _merge_core(x4, sc, lb, w):
    """merge+LN+Linear on the free-reshaped ``(R, 2, W2, 2C)`` layout.

    Under ``shard_map`` (data parallelism) the replicated weights'
    cotangents need no explicit collective: the shard_map transpose
    psums ``P()`` inputs' cotangents itself (same contract as
    ``fused_window_attention._attn_core``)."""
    return _merge_fwd_pallas(x4, sc, lb, w)


def _merge_core_fwd(x4, sc, lb, w):
    return _merge_fwd_pallas(x4, sc, lb, w), (x4, sc, lb, w)


def _merge_core_bwd(res, dy):
    x4, sc, lb, w = res
    dx4, dw, dsc, dlb = _merge_bwd_pallas(x4, dy, sc, lb, w)
    return (dx4, dsc.astype(sc.dtype), dlb.astype(lb.dtype),
            dw.astype(w.dtype))


_merge_core.defvjp(_merge_core_fwd, _merge_core_bwd)


# ---------------------------------------------------------------------------
# PatchExpand: x (R, W, C) -> out (R, 2, W, C)
#
# The output rides as rank-4 with the column-pair fused into the lane
# dim: out[:, p1, :, p2*C/2:(p2+1)*C/2] holds LN group g = 2*p1 + p2,
# so ``(R, 2, W, C) == (B, H, 2, W, 2, C/2) -> (B, 2H, 2W, C/2)`` stays
# a free reshape.  Rationale as in PatchMerging above (rank-5 refs and
# interior strided stores crashed the Mosaic compiler on hardware).
# ---------------------------------------------------------------------------


def _expand_fwd_kernel(x_ref, w_ref, sc_ref, lb_ref, o_ref):
    tr, w_dim, c = x_ref.shape
    c2 = c // 2
    x2 = x_ref[...].reshape(tr * w_dim, c)
    z = _mm(x2, w_ref[...], (((1,), (0,))), x2.dtype)
    # channel layout (p1 p2 c): group g = 2*p1 + p2 at lanes [g*c2,(g+1)*c2)
    n = []
    for g in range(4):
        xhat, _ = _ln_stats(z[:, g * c2:(g + 1) * c2].astype(jnp.float32))
        n.append((xhat * sc_ref[0][None] + lb_ref[0][None])
                 .astype(x2.dtype).reshape(tr, w_dim, c2))
    o_ref[:, 0] = jnp.concatenate((n[0], n[1]), axis=-1)
    o_ref[:, 1] = jnp.concatenate((n[2], n[3]), axis=-1)


def _expand_bwd_kernel(
    x_ref,     # (TR, W, C)
    dy_ref,    # (TR, 2, W, C)
    w_ref,     # (C, 2C)
    sc_ref,    # (1, C/2) f32
    lb_ref,    # (1, C/2) f32
    dx_ref,    # (TR, W, C)
    dw_ref,    # (C, 2C) f32 — accumulated across the grid
    dsc_ref,   # (1, C/2) f32
    dlb_ref,   # (1, C/2) f32
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    tr, w_dim, c = x_ref.shape
    c2 = c // 2
    scale = sc_ref[0][None]

    x2 = x_ref[...].reshape(tr * w_dim, c)
    z = _mm(x2, w_ref[...], (((1,), (0,))), x2.dtype)

    # per-group LN backward, reassembled with a last-axis concat in the
    # (p1 p2 c) channel order (lane slices only — Mosaic-friendly)
    dy = dy_ref[...]
    dsc = jnp.zeros((1, c2), jnp.float32)
    dlb = jnp.zeros((1, c2), jnp.float32)
    dz_groups = []
    for g, (p1, p2) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        dn_g = (dy[:, p1, :, p2 * c2:(p2 + 1) * c2]
                .reshape(tr * w_dim, c2).astype(jnp.float32))
        xhat_g, rsig_g = _ln_stats(
            z[:, g * c2:(g + 1) * c2].astype(jnp.float32))
        dsc += jnp.sum(dn_g * xhat_g, axis=0, keepdims=True)
        dlb += jnp.sum(dn_g, axis=0, keepdims=True)
        dz_groups.append(_ln_bwd(dn_g, xhat_g, rsig_g, scale))
    dsc_ref[...] += dsc
    dlb_ref[...] += dlb
    dz = jnp.concatenate(dz_groups, axis=-1).astype(x2.dtype)
    dw_ref[...] += _mm(x2, dz, (((0,), (0,))))
    dx = _mm(dz, w_ref[...], (((1,), (1,))), x2.dtype)
    dx_ref[...] = dx.reshape(tr, w_dim, c)


def _expand_fwd_pallas(x3, w, sc, lb):
    r, w_dim, c = x3.shape
    tr = _row_tile(r, w_dim * 2 * c)
    xp = _pad_rows(x3, tr)
    grid = (xp.shape[0] // tr,)
    out = pl.pallas_call(
        _expand_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (xp.shape[0], 2, w_dim, c), x3.dtype),
        grid=grid,
        in_specs=[
            _row_spec((tr, w_dim, c)),
            _const_spec((c, 2 * c)),
            _const_spec((1, c // 2)), _const_spec((1, c // 2)),
        ],
        out_specs=_row_spec((tr, 2, w_dim, c)),
        interpret=INTERPRET,
    )(xp, w, sc[None], lb[None])
    return out[:r]


def _expand_bwd_pallas(x3, dy, w, sc, lb):
    r, w_dim, c = x3.shape
    tr = _row_tile(r, w_dim * 2 * c)
    xp = _pad_rows(x3, tr)
    dyp = _pad_rows(dy, tr)
    grid = (xp.shape[0] // tr,)
    f32 = jnp.float32
    dx, dw, dsc, dlb = pl.pallas_call(
        _expand_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x3.dtype),
            jax.ShapeDtypeStruct((c, 2 * c), f32),
            jax.ShapeDtypeStruct((1, c // 2), f32),
            jax.ShapeDtypeStruct((1, c // 2), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec((tr, w_dim, c)),
            _row_spec((tr, 2, w_dim, c)),
            _const_spec((c, 2 * c)),
            _const_spec((1, c // 2)), _const_spec((1, c // 2)),
        ],
        out_specs=(
            _row_spec((tr, w_dim, c)),
            _const_spec((c, 2 * c)),
            _const_spec((1, c // 2)), _const_spec((1, c // 2)),
        ),
        interpret=INTERPRET,
    )(xp, dyp, w, sc[None], lb[None])
    return dx[:r], dw, dsc[0], dlb[0]


@functools.partial(jax.custom_vjp)
def _expand_core(x3, w, sc, lb):
    """Linear+depth-to-space+LN on row-collapsed ``(R, W, C)``."""
    return _expand_fwd_pallas(x3, w, sc, lb)


def _expand_core_fwd(x3, w, sc, lb):
    return _expand_fwd_pallas(x3, w, sc, lb), (x3, w, sc, lb)


def _expand_core_bwd(res, dy):
    x3, w, sc, lb = res
    dx, dw, dsc, dlb = _expand_bwd_pallas(x3, dy, w, sc, lb)
    return (dx, dw.astype(w.dtype), dsc.astype(sc.dtype),
            dlb.astype(lb.dtype))


_expand_core.defvjp(_expand_core_fwd, _expand_core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _backend_ok() -> bool:
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def merge_supported(x_shape: Tuple[int, ...]) -> bool:
    """Kernel applicability for a ``(B, H, W, C)`` PatchMerging input."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    if h % 2 or w % 2 or h < 2 or w < 2:
        return False
    if c % 128:
        return False  # lane alignment of C / 2C / 4C slices
    if c > _env_cap(_MERGE_DIM_CAP):
        return False  # reduction weight must stay VMEM-resident
    return _backend_ok()


def expand_supported(x_shape: Tuple[int, ...]) -> bool:
    """Kernel applicability for a ``(B, H, W, C)`` PatchExpand input."""
    if len(x_shape) != 4:
        return False
    c = x_shape[-1]
    if c % 256:
        return False  # C/2 groups must stay lane-aligned
    if c > _env_cap(_EXPAND_DIM_CAP):
        return False  # expand weight must stay VMEM-resident
    return _backend_ok()


def _shard_run(run, x, args, data_mesh, data_axis):
    if data_mesh is not None and data_mesh.shape.get(data_axis, 1) > 1:
        from jax.sharding import PartitionSpec as P

        n = data_mesh.shape[data_axis]
        if x.shape[0] % n == 0:
            return jax.shard_map(
                run,
                mesh=data_mesh,
                in_specs=(P(data_axis),) + (P(),) * len(args),
                out_specs=P(data_axis),
                check_vma=False,  # pallas outputs carry no vma annotation
            )(x, *args)
    return run(x, *args)


def fused_patch_merge(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    reduction_kernel: jax.Array,
    *,
    data_mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Fused ``Linear(LN(merge_2x2(x)))``: ``(B,H,W,C) -> (B,H/2,W/2,2C)``.

    Semantics of ``models/layers.py::PatchMerging`` (reference
    ``model_parts.py:59-97``: norm before reduction, no bias).
    """
    b, h, w, c = x.shape
    dt = x.dtype
    args = (ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            reduction_kernel.astype(dt))

    def run(xs, sc, lb, wk):
        bs = xs.shape[0]
        x4 = xs.reshape(bs * (h // 2), 2, w // 2, 2 * c)
        out = _merge_core(x4, sc, lb, wk)
        return out.reshape(bs, h // 2, w // 2, 2 * c)

    return _shard_run(run, x, args, data_mesh, data_axis)


def fused_patch_expand(
    x: jax.Array,
    expand_kernel: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    *,
    data_mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Fused ``LN(depth_to_space(Linear(x)))``: ``(B,H,W,C) -> (B,2H,2W,C/2)``.

    Semantics of ``models/layers.py::PatchExpand`` (reference
    ``model_parts.py:374-407``: expand then norm, no bias; einops
    ``(p1 p2 c)`` channel order).
    """
    b, h, w, c = x.shape
    dt = x.dtype
    args = (expand_kernel.astype(dt),
            ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))

    def run(xs, wk, sc, lb):
        bs = xs.shape[0]
        x3 = xs.reshape(bs * h, w, c)
        out = _expand_core(x3, wk, sc, lb)
        return out.reshape(bs, 2 * h, 2 * w, c // 2)

    return _shard_run(run, x, args, data_mesh, data_axis)
