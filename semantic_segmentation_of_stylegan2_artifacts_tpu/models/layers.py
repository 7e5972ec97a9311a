"""MS-UNet building blocks (flax.linen, NHWC, TPU-first).

Module/parameter naming intentionally mirrors the reference PyTorch model
(reference ``network/model_parts.py``) so the checkpoint converter in
``models/weight_convert.py`` is a mechanical key mapping:

    torch ``layers.0.blocks.1.attn.qkv.weight``
    ->  flax ``params['layers_0']['blocks_1']['attn']['qkv']['kernel']`` (T)

Numerical contract replicated from torchvision's ``SwinTransformerBlock``
(consumed by the reference at ``model_parts.py:36,143-151``): pre-LN,
fused qkv with bias, relative position bias table of ``(2w-1)^2 × heads``,
exact-erf GELU, per-sample ("row") stochastic depth on both residuals.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_head, fused_patch, fused_refine_head, \
    fused_window_attention, patch_ops
from ..ops.window_attention import (
    real_token_mask,
    relayout_windows,
    shifted_window_attention,
    shifted_window_mask,
    spatial_to_window,
    window_attention_core,
    window_to_spatial,
)

# torch nn.LayerNorm epsilon (parity with the reference's norm layers)
LN_EPS = 1e-5

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
# torch Conv2d default (kaiming_uniform with a=sqrt(5)) == variance_scaling(1/3)
conv_torch_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _gelu(x: jax.Array, approximate: bool = False) -> jax.Array:
    """GELU. torch nn.GELU defaults to the exact erf formulation; the tanh
    approximation is ~2.2x faster on the v5e VPU (erf costs ~3.6 ms per
    134M elements, measured) and the model runs ~1.8G GELU elements per
    512^2 forward — so deployment configs default to tanh
    (``TPU.GELU_TANH``) while erf remains for strict reference parity."""
    return jax.nn.gelu(x, approximate=approximate)


def layer_norm(name: str, dtype: jnp.dtype = jnp.float32) -> nn.LayerNorm:
    """LayerNorm with torch epsilon; stats in fp32, output in ``dtype``."""
    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name=name)


def apply_layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Functional ``nn.LayerNorm`` (torch eps, f32 fast-variance stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias
    return y.astype(dtype)


class LayerNormParams(nn.Module):
    """Parameter holder for a LayerNorm consumed by a fused op.

    Keeps the ``<name>/scale`` + ``<name>/bias`` param layout of
    ``nn.LayerNorm`` (so checkpoints are interchangeable) while letting
    a Pallas kernel own the compute; ``__call__`` is the XLA fallback.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return apply_layer_norm(x, self.scale, self.bias, self.dtype)


class DenseParams(nn.Module):
    """Parameter holder for a linear layer consumed by a fused op.

    Keeps the ``<name>/kernel`` + ``<name>/bias`` param layout of
    ``nn.Dense`` while letting the (possibly Pallas) op own the compute.
    """

    features_in: int
    features_out: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", trunc_normal_init, (self.features_in, self.features_out),
            jnp.float32,
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
            )

    def __call__(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.kernel, (self.bias if self.use_bias else None)


class StochasticDepth(nn.Module):
    """torchvision ``StochasticDepth(p, "row")``: per-sample residual drop."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        # float(): an np.float64 rate would un-weak-type keep and promote
        # the bf16 residual stream to f32 for the rest of the network
        keep = 1.0 - float(self.rate)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        noise = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return (x * noise / keep).astype(x.dtype)

    def factors(
        self, batch: int, deterministic: bool, dtype: jnp.dtype
    ) -> jax.Array:
        """Per-sample ``noise/keep`` multipliers as a ``(B,)`` f32 vector.

        Consumed by the fused block kernel; draws the module RNG with the
        same shape/order as ``__call__`` so both paths stay on one RNG
        stream (``noise/keep`` is pre-rounded in ``dtype``, matching the
        XLA path's low-precision arithmetic to 1 ulp)."""
        if deterministic or self.rate == 0.0:
            return jnp.ones((batch,), jnp.float32)
        keep = 1.0 - float(self.rate)
        rng = self.make_rng("dropout")
        noise = jax.random.bernoulli(rng, keep, (batch, 1, 1, 1))
        return (noise.astype(dtype) / keep).reshape(batch).astype(jnp.float32)


class Mlp(nn.Module):
    """Transformer MLP: Linear -> GELU -> Dropout -> Linear -> Dropout.

    Torch keys ``mlp.0`` / ``mlp.3`` map to ``fc1`` / ``fc2``.
    """

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    gelu_tanh: bool = False
    dtype: jnp.dtype = jnp.float32
    in_dim: int = 0  # 0 => out_dim (every Swin MLP is square in/out)

    def setup(self):
        # params live in DenseParams holders (same ``fc1/kernel`` tree as
        # nn.Dense) so checkpoints keep one parameter layout regardless
        # of which compute path is traced at init
        self.fc1 = DenseParams(self.in_dim or self.out_dim, self.hidden_dim)
        self.fc2 = DenseParams(self.hidden_dim, self.out_dim)
        self.drop1 = nn.Dropout(self.drop)
        self.drop2 = nn.Dropout(self.drop)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        k1, b1 = self.fc1()
        k2, b2 = self.fc2()
        dt = self.dtype
        nd = x.ndim - 1
        x = jax.lax.dot_general(
            x.astype(dt), k1.astype(dt), (((nd,), (0,)), ((), ()))
        ) + b1.astype(dt)
        x = _gelu(x, self.gelu_tanh)
        x = self.drop1(x, deterministic=deterministic)
        x = jax.lax.dot_general(
            x, k2.astype(dt), (((nd,), (0,)), ((), ()))
        ) + b2.astype(dt)
        x = self.drop2(x, deterministic=deterministic)
        return x


class WindowAttention(nn.Module):
    """Windowed MHSA over an NHWC map; owns qkv/proj/bias-table params."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    attention_dropout: float = 0.0
    dropout: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False
    # mesh for per-shard kernel execution under data parallelism (Pallas
    # custom calls are not partitioned by GSPMD; see fused ops' shard_map)
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    window_group: int = 0  # 0 => auto (pick_window_group)
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        wh, ww = self.window_size
        self.qkv = DenseParams(self.dim, 3 * self.dim, use_bias=self.qkv_bias)
        self.proj = DenseParams(self.dim, self.dim, use_bias=True)
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
            jnp.float32,
        )

    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        *,
        window_major: bool = False,
        mask_np=None,
    ) -> jax.Array:
        qkv_kernel, qkv_bias = self.qkv()
        proj_kernel, proj_bias = self.proj()
        need_rng = not deterministic and (
            self.attention_dropout > 0.0 or self.dropout > 0.0
        )
        rng = self.make_rng("dropout") if need_rng else None
        if window_major:
            # held-layout path: x is (B, nW, N, C); the caller supplies the
            # static shift mask for this block's layout
            return window_attention_core(
                x.astype(self.dtype),
                qkv_kernel,
                qkv_bias,
                proj_kernel,
                proj_bias,
                self.relative_position_bias_table,
                window_size=tuple(self.window_size),
                num_heads=self.num_heads,
                mask_np=mask_np,
                attention_dropout=self.attention_dropout,
                dropout=self.dropout,
                dropout_rng=rng,
                deterministic=deterministic,
                softmax_dtype=self.softmax_dtype,
                window_group=(self.window_group or None),
            )
        if self.use_pallas and rng is None and fused_window_attention.supported(
            x.shape, tuple(self.window_size), self.num_heads,
            attention_dropout=self.attention_dropout,
            deterministic=deterministic,
            dtype=self.dtype,
        ):
            # fused TPU kernel (no dropout path); XLA op otherwise
            return fused_window_attention.fused_shifted_window_attention(
                x.astype(self.dtype),
                qkv_kernel,
                qkv_bias,
                proj_kernel,
                proj_bias,
                self.relative_position_bias_table,
                window_size=tuple(self.window_size),
                shift_size=tuple(self.shift_size),
                num_heads=self.num_heads,
                data_mesh=self.data_mesh,
                data_axis=self.data_axis,
            )
        return shifted_window_attention(
            x.astype(self.dtype),
            qkv_kernel,
            qkv_bias,
            proj_kernel,
            proj_bias,
            self.relative_position_bias_table,
            window_size=tuple(self.window_size),
            shift_size=tuple(self.shift_size),
            num_heads=self.num_heads,
            attention_dropout=self.attention_dropout,
            dropout=self.dropout,
            dropout_rng=rng,
            deterministic=deterministic,
            softmax_dtype=self.softmax_dtype,
            window_group=(self.window_group or None),
        )


class SwinBlock(nn.Module):
    """One Swin transformer block on ``(B, H, W, C)`` (torchvision contract).

    ``x = x + sd(attn(norm1(x)))``; ``x = x + sd(mlp(norm2(x)))``.
    """

    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    window_group: int = 0
    gelu_tanh: bool = False
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        w = self.window_size
        s = w // 2 if self.shift else 0
        self.norm1 = LayerNormParams(self.dim, dtype=self.dtype, name="norm1")
        self.attn = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=(w, w),
            shift_size=(s, s),
            attention_dropout=self.attention_dropout,
            dropout=self.dropout,
            qkv_bias=self.qkv_bias,
            use_pallas=self.use_pallas,
            data_mesh=self.data_mesh,
            data_axis=self.data_axis,
            window_group=self.window_group,
            softmax_dtype=self.softmax_dtype,
            dtype=self.dtype,
            name="attn",
        )
        self.stochastic_depth = StochasticDepth(self.stochastic_depth_prob)
        self.norm2 = LayerNormParams(self.dim, dtype=self.dtype, name="norm2")
        self.mlp = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio),
            out_dim=self.dim,
            drop=self.dropout,
            gelu_tanh=self.gelu_tanh,
            dtype=self.dtype,
            name="mlp",
        )

    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        window_major_hw: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        """Spatial ``(B,H,W,C)`` by default; with ``window_major_hw=(H,W)``
        the input/output are window-major ``(B,nW,N,C)`` in this block's
        shift layout (held-layout path, see BasicLayer)."""
        if window_major_hw is None:
            y = self.attn(self.norm1(x), deterministic=deterministic)
        else:
            h, w = window_major_hw
            wsz = self.window_size
            hp, wp = h + (-h % wsz), w + (-w % wsz)
            s = wsz // 2 if self.shift else 0
            sh = 0 if wsz >= hp else s
            sw = 0 if wsz >= wp else s
            mask_np = (
                shifted_window_mask(hp, wp, wsz, wsz, sh, sw)
                if (sh or sw)
                else None
            )
            y = self.norm1(x)
            rmask = real_token_mask(h, w, hp, wp, wsz, wsz, sh, sw)
            if rmask is not None:
                # zero the normed pad tokens: numerically identical to the
                # spatial path, which zero-pads the normed map
                y = y * jnp.asarray(rmask, y.dtype)[None]
            y = self.attn(
                y, deterministic=deterministic, window_major=True,
                mask_np=mask_np,
            )
        x = x + self.stochastic_depth(y, deterministic)
        y = self.mlp(self.norm2(x), deterministic=deterministic)
        x = x + self.stochastic_depth(y, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Conv k=4 s=4 patchify + LayerNorm; ``(B,H,W,3) -> (B,H/4,W/4,E)``.

    Reference: ``model_parts.py:187-225`` (NCHW conv there; NHWC here).
    """

    patch_size: int = 4
    embed_dim: int = 128
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            kernel_init=conv_torch_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.patch_norm:
            x = layer_norm("norm", self.dtype)(x)
        return x


class PatchMerging(nn.Module):
    """2×2 neighbor concat -> LN(4C) -> Linear(4C,2C,no-bias); halves H,W.

    Reference: ``model_parts.py:59-97`` (norm *before* reduction).  With
    ``use_fused_patch`` the merge relayout + LN + Linear run as one
    Pallas program (``ops/fused_patch.py``) when the shape qualifies.
    """

    dim: int
    use_fused_patch: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # params live in holders (same ``norm/scale`` + ``reduction/
        # kernel`` tree as the nn.LayerNorm/nn.Dense pair) so the fused
        # path and the XLA path share one parameter layout
        self.norm = LayerNormParams(4 * self.dim, dtype=self.dtype,
                                    name="norm")
        self.reduction = DenseParams(4 * self.dim, 2 * self.dim,
                                     use_bias=False, name="reduction")

    def __call__(self, x: jax.Array) -> jax.Array:
        kernel, _ = self.reduction()
        if self.use_fused_patch and fused_patch.merge_supported(x.shape):
            return fused_patch.fused_patch_merge(
                x.astype(self.dtype), self.norm.scale, self.norm.bias,
                kernel, data_mesh=self.data_mesh, data_axis=self.data_axis,
            )
        x = patch_ops.merge_2x2(x)
        x = self.norm(x)
        nd = x.ndim - 1
        return jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((nd,), (0,)), ((), ())),
        )


class PatchExpand(nn.Module):
    """Linear(C,2C,no-bias) -> 2×2 depth-to-space -> LN(C/2); doubles H,W.

    Reference: ``model_parts.py:374-407``.  With ``use_fused_patch`` the
    Linear + depth-to-space relayout + LN run as one Pallas program
    (``ops/fused_patch.py``) when the shape qualifies.
    """

    dim: int
    use_fused_patch: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.expand = DenseParams(self.dim, 2 * self.dim,
                                  use_bias=False, name="expand")
        self.norm = LayerNormParams(self.dim // 2, dtype=self.dtype,
                                    name="norm")

    def __call__(self, x: jax.Array) -> jax.Array:
        kernel, _ = self.expand()
        if self.use_fused_patch and fused_patch.expand_supported(x.shape):
            return fused_patch.fused_patch_expand(
                x.astype(self.dtype), kernel, self.norm.scale,
                self.norm.bias,
                data_mesh=self.data_mesh, data_axis=self.data_axis,
            )
        nd = x.ndim - 1
        x = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((nd,), (0,)), ((), ())),
        )
        x = patch_ops.depth_to_space(x, 2)
        return self.norm(x)


class PointwiseConv(nn.Module):
    """Bias-free 1×1 NHWC conv computed as a channel ``dot_general``.

    Numerically identical to ``nn.Conv(features, (1, 1), use_bias=False)``
    and keeps its exact param layout (``kernel`` of shape
    ``(1, 1, C, features)``), but lowers to a plain contraction instead
    of ``conv_general_dilated``: for the model head's 128→1 projection
    at full 512² resolution, XLA's conv emitter picks a
    batch-in-sublanes layout and brackets the op with ~0.5 GB
    relayout copies of the (B,512,512,C) input per direction — ~14 ms
    of the r4 train step for a 0.5-GFLOP op (hlo_breakdown, ``output``
    section).  A dot_general contraction fuses into the surrounding
    elementwise graph with no layout constraint.  (Reference head:
    ``model_parts.py``'s ``nn.Conv2d(embed_dim, num_class, 1, bias=False)``.)
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", conv_torch_init,
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        nd = x.ndim - 1
        return jax.lax.dot_general(
            x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
            (((nd,), (0,)), ((), ())),
        )


class ConvParams(nn.Module):
    """Parameter holder with ``nn.Conv``'s ``kernel``/``bias`` layout for
    a 3x3 conv whose compute is owned by a fused op."""

    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel", conv_torch_init,
            (3, 3, self.features_in, self.features_out), jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
        )

    def __call__(self) -> Tuple[jax.Array, jax.Array]:
        return self.kernel, self.bias


class NormParams(nn.Module):
    """Parameter holder with ``nn.LayerNorm``'s ``scale``/``bias`` layout
    for a norm whose compute is owned by a fused op."""

    features: int

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self) -> Tuple[jax.Array, jax.Array]:
        return self.scale, self.bias


class FinalPatchExpandX4V2(nn.Module):
    """Linear(C,16C) -> GELU -> ×4 depth-to-space -> two 3×3 convs -> LN.

    The checkerboard-smoothing final upsampler
    (reference ``model_parts.py:437-476``).  With ``fused_head`` on and a
    supported shape the whole tail after the expand projection runs as
    ONE Pallas kernel per direction (``ops/fused_refine_head.py``) — the
    r3 op-level breakdown measured the composed XLA tail at ~21% of the
    512² train step, ~2.5x over its bandwidth floor.  Unsupported shapes
    fall back first to the GELU+depth-to-space-only kernel, then to the
    composed XLA ops; parameter names/shapes are identical on all paths.
    """

    dim: int
    gelu_tanh: bool = False
    fused_head: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            16 * self.dim,
            use_bias=False,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="expand",
        )(x)
        if self.fused_head and fused_refine_head.supported(
                x.shape, self.gelu_tanh):
            w1, b1 = ConvParams(self.dim, self.dim, name="refine1")()
            w2, b2 = ConvParams(self.dim, self.dim, name="refine2")()
            g, be = NormParams(self.dim, name="norm")()
            if self.data_mesh is not None:
                return fused_refine_head.fused_refine_head_sharded(
                    x, w1, b1, w2, b2, g, be,
                    self.data_mesh, self.data_axis)
            return fused_refine_head.fused_refine_head(
                x, w1, b1, w2, b2, g, be)
        if self.fused_head and fused_head.supported(x.shape, self.gelu_tanh):
            if self.data_mesh is not None:
                x = fused_head.fused_gelu_d2s4_sharded(
                    x, self.data_mesh, self.data_axis)
            else:
                x = fused_head.fused_gelu_d2s4(x)
        else:
            x = _gelu(x, self.gelu_tanh)
            x = patch_ops.depth_to_space(x, 4)
        x = nn.Conv(
            self.dim,
            kernel_size=(3, 3),
            padding="SAME",
            kernel_init=conv_torch_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="refine1",
        )(x)
        x = _gelu(x, self.gelu_tanh)
        x = nn.Conv(
            self.dim,
            kernel_size=(3, 3),
            padding="SAME",
            kernel_init=conv_torch_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="refine2",
        )(x)
        x = layer_norm("norm", self.dtype)(x)
        return x


def _maybe_remat(block_cls, remat: bool, policy: str = ""):
    """Wrap a block in jax.checkpoint.

    policy "" => full remat; "dots" => save non-batched dot outputs
    (qkv/proj/mlp matmuls) and recompute attention logits/softmax/LN in
    the backward pass — the memory/compute sweet spot that fits the
    reference's 1024² batch-2 config on a 16GB chip.
    """
    if not remat:
        return block_cls
    if policy == "dots":
        return nn.remat(
            block_cls, static_argnums=(2, 3),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    return nn.remat(block_cls, static_argnums=(2, 3))



def _run_blocks(blocks, x, deterministic, window_size, hold_layout):
    """Run a stage's Swin blocks, optionally holding window-major layout.

    Held layout replaces each block's pad/roll/partition/reverse/roll/slice
    relayout chain with one reverse+roll+partition at shift changes and a
    single enter/exit conversion per stage (docs/ROADMAP.md P0.1).  Real
    token numerics are identical to the spatial path (pad tokens are
    re-zeroed post-norm before each attention).
    """
    if not hold_layout or not blocks:
        for blk in blocks:
            x = blk(x, deterministic, None)
        return x

    b, h, w, c = x.shape
    wsz = window_size
    hp, wp = h + (-h % wsz), w + (-w % wsz)

    def eff_shift(is_shifted: bool) -> Tuple[int, int]:
        s = wsz // 2 if is_shifted else 0
        return (0 if wsz >= hp else s, 0 if wsz >= wp else s)

    shifts = [eff_shift(i % 2 == 1) for i in range(len(blocks))]
    cur = shifts[0]
    xw = spatial_to_window(x, wsz, wsz, *cur)
    for blk, shift in zip(blocks, shifts):
        if shift != cur:
            xw = relayout_windows(xw, h, w, wsz, wsz, cur, shift)
            cur = shift
        xw = blk(xw, deterministic, (h, w))
    return window_to_spatial(xw, h, w, wsz, wsz, *cur)


class BasicLayer(nn.Module):
    """One encoder stage: ``depth`` Swin blocks + optional PatchMerging.

    Reference: ``model_parts.py:109-173``.  Alternating shift 0 / w//2.
    """

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    downsample: bool = False
    use_remat: bool = False
    remat_policy: str = ""
    use_pallas: bool = False
    use_fused_patch: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    window_group: int = 0
    hold_layout: bool = False
    gelu_tanh: bool = False
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        block_cls = _maybe_remat(SwinBlock, self.use_remat, self.remat_policy)
        self.blocks = [
            block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                dropout=self.drop,
                attention_dropout=self.attn_drop,
                stochastic_depth_prob=(
                    self.drop_path[i] if len(self.drop_path) else 0.0
                ),
                qkv_bias=self.qkv_bias,
                use_pallas=self.use_pallas,
                data_mesh=self.data_mesh,
                data_axis=self.data_axis,
                window_group=self.window_group,
                gelu_tanh=self.gelu_tanh,
                softmax_dtype=self.softmax_dtype,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        if self.downsample:
            self.downsample_layer = PatchMerging(
                dim=self.dim, use_fused_patch=self.use_fused_patch,
                data_mesh=self.data_mesh, data_axis=self.data_axis,
                dtype=self.dtype, name="downsample"
            )

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = _run_blocks(
            self.blocks, x, deterministic, self.window_size, self.hold_layout
        )
        if self.downsample:
            x = self.downsample_layer(x)
        return x


class BasicLayerUp(nn.Module):
    """One decoder stage: ``depth`` Swin blocks + optional PatchExpand.

    Reference: ``model_parts.py:478-541``.
    """

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    upsample: bool = False
    use_remat: bool = False
    remat_policy: str = ""
    use_pallas: bool = False
    use_fused_patch: bool = False
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    window_group: int = 0
    hold_layout: bool = False
    gelu_tanh: bool = False
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        block_cls = _maybe_remat(SwinBlock, self.use_remat, self.remat_policy)
        self.blocks = [
            block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                dropout=self.drop,
                attention_dropout=self.attn_drop,
                stochastic_depth_prob=(
                    self.drop_path[i] if len(self.drop_path) else 0.0
                ),
                qkv_bias=self.qkv_bias,
                use_pallas=self.use_pallas,
                data_mesh=self.data_mesh,
                data_axis=self.data_axis,
                window_group=self.window_group,
                gelu_tanh=self.gelu_tanh,
                softmax_dtype=self.softmax_dtype,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        if self.upsample:
            self.upsample_layer = PatchExpand(
                dim=self.dim, use_fused_patch=self.use_fused_patch,
                data_mesh=self.data_mesh, data_axis=self.data_axis,
                dtype=self.dtype, name="upsample"
            )

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = _run_blocks(
            self.blocks, x, deterministic, self.window_size, self.hold_layout
        )
        if self.upsample:
            x = self.upsample_layer(x)
        return x
