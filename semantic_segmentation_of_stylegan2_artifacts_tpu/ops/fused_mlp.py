"""Fused transformer-MLP sublayer (LN -> fc1 -> GELU -> fc2) Pallas kernel.

Why: the r3 HLO cost audit showed the 512² train step is HBM-bandwidth
bound (byte roofline 181 ms vs FLOP roofline 62 ms for a 283 ms step),
and the MLP half-block is the largest unfused byte stream: the XLA path
materializes the LN output, the 4C-wide fc1/GELU hidden tensor (twice —
written by fc1, re-read by fc2), saves the hidden for the backward, and
materializes the 4C-wide hidden cotangent.  Per stage-2-shaped block
(32² grid, C=512, batch 8) that is ~1.3 GB of fwd+bwd traffic for a
sublayer whose FLOPs fit in ~0.5 ms of MXU time.

This kernel keeps everything between the residual reads/writes in VMEM:

* grid = token tiles of the flattened ``(T, C)`` token matrix (the MLP
  is position-independent, so batch/space dims are collapsed);
* both weight matrices ride as constant-index blocks, resident in VMEM
  for the whole grid (hence the ``C <= 512`` / ``4C <= 2048`` gate);
* LayerNorm (f32 stats, flax fast-variance semantics) is computed
  in-kernel, so the normed tensor never exists in HBM;
* forward writes ONLY the branch output ``fc2(gelu(fc1(LN(x))))`` —
  the residual add stays outside because the model applies per-sample
  stochastic depth to the branch (``layers.py::SwinBlock``);
* backward is flash-style: nothing is saved but ``x`` (which the
  residual stream keeps alive anyway); LN/fc1/GELU are recomputed
  per tile and the weight/bias/LN-parameter gradients are accumulated
  across the token grid into constant-index f32 output blocks (TPU
  grid execution is sequential — same pattern as the bias-table
  gradient in ``fused_window_attention._bwd_kernel``).

The torch key contract (``mlp.0``/``mlp.3`` -> ``fc1``/``fc2``,
reference ``network/model_parts.py:41-56`` Mlp) is owned by the flax
module in ``models/layers.py``; this op only consumes the kernels.

Numerics match the XLA path (``models/layers.py::Mlp`` +
``apply_layer_norm``) to bf16 rounding: dots accumulate f32 on the MXU,
GELU (erf or tanh) runs through ``jax.nn.gelu``/its VJP on the same
dtype as the XLA path, LN params and their grads stay f32.  Asserted in
``tests/test_fused_mlp.py`` (interpret mode).  Gated by
``TPU.FUSED_MLP`` + backend/shape support.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to run the kernel in the Pallas interpreter on CPU
INTERPRET = False

# torch nn.LayerNorm epsilon (models/layers.py::LN_EPS)
_LN_EPS = 1e-5

# widest channel dim whose fc1/fc2 weights stay VMEM-resident for the
# whole grid: C=512 => 2+2 MB bf16 weights + 4+4 MB f32 dW accumulators.
# The C=1024 stages (16² grid, ~7 ms of the 512² step) stay on XLA.
_DIM_CAP = 512


def _token_tile(t: int, hidden: int) -> int:
    """Token-tile size: bounds the (TM, 4C) f32/bf16 temporaries of the
    backward body against the 16 MB Mosaic scoped-vmem stack."""
    cap = 256 if hidden > 1024 else 512
    tile = min(cap, t)
    return max(8, tile + (-tile % 8))


def _ln_normed(x_tile, scale, bias):
    """flax ``nn.LayerNorm`` numerics: f32 fast-variance stats, clipped,
    scale/bias in f32; returns (normed_in_input_dtype, xhat_f32, rsig)."""
    xf = x_tile.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    rsig = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mean) * rsig
    n = (xhat * scale + bias).astype(x_tile.dtype)
    return n, xhat, rsig


def _mm(a, b, dims, out_dtype=None):
    out = jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    return out if out_dtype is None else out.astype(out_dtype)


def _fwd_kernel(
    x_ref,      # (TM, C) input dtype
    sc_ref,     # (1, C) f32 LN scale
    lb_ref,     # (1, C) f32 LN bias
    w1_ref,     # (C, H) input dtype
    b1_ref,     # (1, H) input dtype
    w2_ref,     # (H, C) input dtype
    b2_ref,     # (1, C) input dtype
    o_ref,      # (TM, C) input dtype
    *,
    gelu_tanh: bool,
):
    n, _, _ = _ln_normed(x_ref[...], sc_ref[0][None], lb_ref[0][None])
    z1 = _mm(n, w1_ref[...], (((1,), (0,))), n.dtype) + b1_ref[0][None]
    h = jax.nn.gelu(z1, approximate=gelu_tanh)
    o_ref[...] = _mm(h, w2_ref[...], (((1,), (0,))), n.dtype) + b2_ref[0][None]


def _bwd_kernel(
    x_ref,      # (TM, C)
    dy_ref,     # (TM, C)
    sc_ref,     # (1, C) f32
    lb_ref,     # (1, C) f32
    w1_ref,     # (C, H)
    b1_ref,     # (1, H)
    w2_ref,     # (H, C)
    b2_ref,     # (1, C)
    dx_ref,     # (TM, C) input dtype
    dw1_ref,    # (C, H) f32 — accumulated across the grid
    db1_ref,    # (1, H) f32
    dw2_ref,    # (H, C) f32
    db2_ref,    # (1, C) f32
    dsc_ref,    # (1, C) f32
    dlb_ref,    # (1, C) f32
    *,
    gelu_tanh: bool,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    scale = sc_ref[0][None]
    x = x_ref[...]
    dy = dy_ref[...]

    # recompute the forward (flash-style; only x was saved)
    n, xhat, rsig = _ln_normed(x, scale, lb_ref[0][None])
    z1 = _mm(n, w1_ref[...], (((1,), (0,))), n.dtype) + b1_ref[0][None]
    gelu = lambda z: jax.nn.gelu(z, approximate=gelu_tanh)  # noqa: E731
    h, gelu_vjp = jax.vjp(gelu, z1)

    dyf = dy.astype(jnp.float32)
    db2_ref[...] += jnp.sum(dyf, axis=0, keepdims=True)
    dw2_ref[...] += _mm(h, dy, (((0,), (0,))))
    dh = _mm(dy, w2_ref[...], (((1,), (1,))), h.dtype)
    dz1 = gelu_vjp(dh)[0]
    dz1f = dz1.astype(jnp.float32)
    db1_ref[...] += jnp.sum(dz1f, axis=0, keepdims=True)
    dw1_ref[...] += _mm(n, dz1, (((0,), (0,))))
    # dn in the input dtype (the XLA path's Dense bwd is a bf16 dot);
    # the LayerNorm VJP then runs in f32, as flax's does
    dn = _mm(dz1, w1_ref[...], (((1,), (1,))), n.dtype).astype(jnp.float32)
    dsc_ref[...] += jnp.sum(dn * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dn, axis=0, keepdims=True)
    dxh = dn * scale
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx_ref[...] = ((dxh - m1 - xhat * m2) * rsig).astype(dx_ref.dtype)


def _pad_tokens(x2: jax.Array, tm: int) -> jax.Array:
    t = x2.shape[0]
    pad = -t % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _fwd_pallas(x2, sc, lb, w1, b1, w2, b2, *, gelu_tanh):
    t, c = x2.shape
    hid = w1.shape[1]
    tm = _token_tile(t, hid)
    xp = _pad_tokens(x2, tm)
    grid = (xp.shape[0] // tm,)
    tile_spec = pl.BlockSpec((tm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, gelu_tanh=gelu_tanh),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2.dtype),
        grid=grid,
        in_specs=[
            tile_spec,
            _const_spec((1, c)), _const_spec((1, c)),
            _const_spec((c, hid)), _const_spec((1, hid)),
            _const_spec((hid, c)), _const_spec((1, c)),
        ],
        out_specs=tile_spec,
        interpret=INTERPRET,
    )(xp, sc[None], lb[None], w1, b1[None], w2, b2[None])
    return out[:t]


def _bwd_pallas(x2, dy2, sc, lb, w1, b1, w2, b2, *, gelu_tanh):
    t, c = x2.shape
    hid = w1.shape[1]
    tm = _token_tile(t, hid)
    xp = _pad_tokens(x2, tm)
    dyp = _pad_tokens(dy2, tm)
    grid = (xp.shape[0] // tm,)
    tile_spec = pl.BlockSpec((tm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, gelu_tanh=gelu_tanh),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x2.dtype),
            jax.ShapeDtypeStruct((c, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        grid=grid,
        in_specs=[
            tile_spec, tile_spec,
            _const_spec((1, c)), _const_spec((1, c)),
            _const_spec((c, hid)), _const_spec((1, hid)),
            _const_spec((hid, c)), _const_spec((1, c)),
        ],
        out_specs=(
            tile_spec,
            _const_spec((c, hid)), _const_spec((1, hid)),
            _const_spec((hid, c)), _const_spec((1, c)),
            _const_spec((1, c)), _const_spec((1, c)),
        ),
        interpret=INTERPRET,
    )(xp, dyp, sc[None], lb[None], w1, b1[None], w2, b2[None])
    dx, dw1, db1, dw2, db2, dsc, dlb = outs
    return dx[:t], dw1, db1[0], dw2, db2[0], dsc[0], dlb[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mlp_core(x2, sc, lb, w1, b1, w2, b2, gelu_tanh):
    """LN+MLP branch on flattened tokens: ``(T,C) -> (T,C)``.

    Under ``shard_map`` (data parallelism) the replicated weights'
    cotangents need no explicit collective: the shard_map transpose
    psums ``P()`` inputs' cotangents itself (same contract as
    ``fused_window_attention._attn_core``)."""
    return _fwd_pallas(x2, sc, lb, w1, b1, w2, b2, gelu_tanh=gelu_tanh)


def _mlp_core_fwd(x2, sc, lb, w1, b1, w2, b2, gelu_tanh):
    out = _fwd_pallas(x2, sc, lb, w1, b1, w2, b2, gelu_tanh=gelu_tanh)
    return out, (x2, sc, lb, w1, b1, w2, b2)


def _mlp_core_bwd(gelu_tanh, res, dy2):
    x2, sc, lb, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2, dsc, dlb = _bwd_pallas(
        x2, dy2, sc, lb, w1, b1, w2, b2, gelu_tanh=gelu_tanh
    )
    # weight/bias cotangents round to the primal dtype (the XLA path's
    # bf16 dots do the same before the autodiff cast back to f32 params)
    return (dx, dsc.astype(sc.dtype), dlb.astype(lb.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def supported(
    x_shape: Tuple[int, ...],
    hidden_dim: int,
    *,
    dropout: float = 0.0,
    deterministic: bool = True,
    dtype=None,
) -> bool:
    """Kernel applicability for a ``(..., C)`` input."""
    if not deterministic and dropout > 0.0:
        return False  # dropout inside the MLP stays on the XLA path
    c = x_shape[-1]
    if c % 128 or hidden_dim % 128:
        return False  # lane alignment
    # the VMEM budget is sized for bf16 weights; an f32 model (parity
    # mode) doubles them and the C=512 backward exceeds the 16 MB scoped
    # limit (measured on hardware, r4) — halve the cap
    cap = _DIM_CAP // 2 if (dtype is not None
                            and jnp.dtype(dtype).itemsize >= 4) else _DIM_CAP
    if c > cap or hidden_dim > 4 * cap:
        return False  # weights must stay VMEM-resident
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_mlp(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: jax.Array,
    fc2_kernel: jax.Array,
    fc2_bias: jax.Array,
    *,
    gelu_tanh: bool = False,
    data_mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Fused ``fc2(gelu(fc1(LN(x))))`` branch over any ``(..., C)`` map.

    The residual add and stochastic depth stay in the caller
    (``models/layers.py::SwinBlock``).  ``data_mesh``: when training
    data-parallel, the kernel runs per-shard under ``shard_map`` over
    ``data_axis`` (Pallas custom calls are not auto-partitioned by
    GSPMD), batch axis leading.
    """
    dt = x.dtype
    args = (
        ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        fc1_kernel.astype(dt), fc1_bias.astype(dt),
        fc2_kernel.astype(dt), fc2_bias.astype(dt),
    )

    def run(xs, *ps):
        lead = xs.shape[:-1]
        x2 = xs.reshape(-1, xs.shape[-1])
        out = _mlp_core(x2, *ps, gelu_tanh)
        return out.reshape(*lead, xs.shape[-1])

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
