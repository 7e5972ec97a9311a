"""Fused GELU + x4 depth-to-space for the decoder head (Pallas TPU).

The reference head (``network/model_parts.py:437-476``,
``FinalPatchExpand_X4_V2``) runs Linear(C->16C) -> GELU -> x4
depth-to-space -> convs.  Measured on v5e at 512^2 batch 8, the unfused
XLA path costs ~7.4 ms forward for the GELU + relayout alone (each op is
a separate HBM round-trip over a 268 MB tensor).  This kernel does both
in one HBM pass: read a row segment, tanh-GELU in VMEM (f32 math),
relayout 4x4 channel blocks onto the spatial grid in VMEM, write the
expanded segment.  Backward is the mirror kernel: space-to-depth gather
of the cotangent fused with the GELU derivative.

The grid is (batch, row, width-chunk) with one input row per program
and the width chunked so a program's f32 temporaries stay well inside
the 16 MB scoped-vmem stack at any resolution (512^2's W=128 two-row
strips and 1024^2's W=256 single rows both measured at/over the limit).

Only the tanh-GELU deployment mode is fused (``TPU.GELU_TANH``); the
exact-erf parity mode keeps the composed XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False
_SQRT_2_OVER_PI = 0.7978845608028654
_KAPPA = 0.044715

# max elements of one (w_chunk, 16C) input segment — keeps each program's
# f32 temporaries a few MB under the 16 MB scoped-vmem stack
_CHUNK_ELEMS = 128 * 2048


def _chunk_for(w: int, c16: int) -> int:
    """Largest divisor of ``w`` whose segment fits the element budget."""
    cap = max(1, _CHUNK_ELEMS // max(1, c16))
    for wc in range(min(w, cap), 0, -1):
        if w % wc == 0:
            return wc
    return 1


def _gelu_tanh_f32(x):
    u = _SQRT_2_OVER_PI * (x + _KAPPA * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad_f32(x):
    x2 = x * x
    u = _SQRT_2_OVER_PI * (x + _KAPPA * x * x2)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _KAPPA * x2)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _fwd_kernel(x_ref, o_ref, *, wc: int, c: int):
    # x_ref: (1, 1, wc, 16C); o_ref: (1, 4, 4*wc, C)
    row = x_ref[0, 0].astype(jnp.float32)  # (wc, 16C)
    row = _gelu_tanh_f32(row)
    x4 = row.reshape(wc, 4, 4, c)  # (wc, p1, p2, C)
    for p1 in range(4):
        # output plane p1, columns 4*w+p2 <- x4[w, p1, p2]
        o_ref[0, p1] = x4[:, p1].reshape(4 * wc, c).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, wc: int, c: int):
    # x_ref/dx_ref: (1, 1, wc, 16C); g_ref: (1, 4, 4*wc, C)
    planes = []
    for p1 in range(4):
        gp = g_ref[0, p1].astype(jnp.float32)  # (4*wc, C)
        planes.append(gp.reshape(wc, 4, c))  # (wc, p2, C)
    g4 = jnp.stack(planes, axis=1)  # (wc, p1, p2, C)
    gflat = g4.reshape(wc, 16 * c)
    x = x_ref[0, 0].astype(jnp.float32)
    dx_ref[0, 0] = (gflat * _gelu_tanh_grad_f32(x)).astype(dx_ref.dtype)


def _fwd_pallas(x: jax.Array) -> jax.Array:
    b, h, w, c16 = x.shape
    c = c16 // 16
    wc = _chunk_for(w, c16)
    grid = (b, h, w // wc)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, wc=wc, c=c),
        out_shape=jax.ShapeDtypeStruct((b, 4 * h, 4 * w, c), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, wc, c16),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, 4 * wc, c),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x)


def _bwd_pallas(x: jax.Array, g: jax.Array) -> jax.Array:
    b, h, w, c16 = x.shape
    c = c16 // 16
    wc = _chunk_for(w, c16)
    grid = (b, h, w // wc)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, wc=wc, c=c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, wc, c16), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4 * wc, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wc, c16), lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x, g)


@jax.custom_vjp
def fused_gelu_d2s4(x: jax.Array) -> jax.Array:
    """tanh-GELU then x4 depth-to-space: ``(B,H,W,16C) -> (B,4H,4W,C)``.

    Same channel decomposition as :func:`..ops.patch_ops.depth_to_space`
    (p1-major, reference ``model_parts.py:464``).
    """
    return _fwd_pallas(x)


def _vjp_fwd(x):
    return _fwd_pallas(x), x


def _vjp_bwd(x, g):
    return (_bwd_pallas(x, g),)


fused_gelu_d2s4.defvjp(_vjp_fwd, _vjp_bwd)


def fused_gelu_d2s4_sharded(x: jax.Array, data_mesh, data_axis: str = "data"
                            ) -> jax.Array:
    """Per-data-shard :func:`fused_gelu_d2s4` via ``shard_map``.

    Pallas custom calls have no GSPMD rule; mapping the batch-leading
    grid over the mesh's data axis keeps DP training sharded.  All
    inputs/outputs vary over the data axis only, so the transpose needs
    no collectives.  Falls back to the single-program call for batches
    the axis doesn't divide (e.g. batch-1 eval).
    """
    from jax.sharding import PartitionSpec as P

    n = data_mesh.shape.get(data_axis, 1)
    if n <= 1 or x.shape[0] % n:
        return fused_gelu_d2s4(x)
    f = jax.shard_map(fused_gelu_d2s4, mesh=data_mesh,
                      in_specs=(P(data_axis),), out_specs=P(data_axis),
                      check_vma=False)  # pallas outputs carry no vma
    return f(x)


def supported(x_shape, gelu_tanh: bool) -> bool:
    """Kernel applicability: TPU backend, tanh mode, 16x channel blocks."""
    if not gelu_tanh:
        return False
    b, h, w, c16 = x_shape
    if c16 % 16:
        return False
    if INTERPRET:
        return True
    # the in-kernel reshape splits the lane axis into (4, 4, C); Mosaic
    # rejects the shape cast when C is narrower than one 128-lane tile
    # ("infer-vector-layout: unsupported shape cast", probed on v5e with
    # C=16 at img 32) — tiny configs fall back to the XLA path
    if (c16 // 16) % 128:
        return False
    try:
        # the axon relay registers the v5e chip under its own platform name
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
