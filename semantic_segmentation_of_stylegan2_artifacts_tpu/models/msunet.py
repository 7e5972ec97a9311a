"""MS-UNet: Swin U-Net with two multi-scale auxiliary ("cent") decoders.

TPU-native re-implementation of the reference model
(reference ``network/model_parts.py:543-893`` and ``network/MSUNet.py``):

* 4-stage Swin encoder (depths [2,2,18,2], Swin-B widths),
* two auxiliary decoders that run *during* the encoder pass and rewrite
  skip tensors 0 and 1 before the main decoder consumes them
  (``model_parts.py:775-815``),
* a main decoder whose stage depths reuse the *encoder* depth list —
  i.e. decoder stage 1 has 18 blocks (``model_parts.py:660``, the
  ``DECODER_DEPTHS`` config knob is printed but never wired; reproduced
  deliberately for checkpoint compatibility),
* shared ``concat_back_dim`` skip-reduction Linears used by both the cent
  decoders and the main decoder (``model_parts.py:793,805,824``),
* ``FinalPatchExpand_X4_V2`` head (Linear ×16 -> depth-to-space ×4 -> two
  3×3 convs) and a bias-free 1×1 output conv.

Layout is NHWC end-to-end; returns logits of shape ``(B, H, W, classes)``.
Stochastic depth decays linearly 0 -> DROP_PATH_RATE over the 24 encoder
blocks; decoder/cent stages reuse the mirrored encoder stage's rates, as
in the reference.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import (
    BasicLayer,
    BasicLayerUp,
    FinalPatchExpandX4V2,
    PatchEmbed,
    PatchExpand,
    PointwiseConv,
    layer_norm,
    trunc_normal_init,
)


def _dpr(drop_path_rate: float, depths: Sequence[int]) -> List[float]:
    """Linear stochastic-depth decay over all encoder blocks.

    Python floats, NOT np.float64 scalars: a NumPy scalar is not weak-
    typed under JAX promotion, so ``x * noise / np.float64(keep)`` in
    StochasticDepth promoted the bf16 residual stream — and with it every
    downstream block of the training step — to f32 (caught on hardware in
    r4: an f32[8192,512] fused-MLP backward OOM'd scoped VMEM)."""
    total = sum(depths)
    return [float(r) for r in np.linspace(0.0, drop_path_rate, total)]


def _stage_slice(dpr: List[float], depths: Sequence[int], stage: int) -> List[float]:
    lo = sum(depths[:stage])
    return dpr[lo : lo + depths[stage]]


def _pallas_stages(flag: bool, img_size: int, patch: int, n_stages: int,
                   window: int) -> Union[bool, Tuple[bool, ...]]:
    """Fused-attention stage selection for ``from_config``.

    Wide token grids (padded width > 20 windows) fall back to the XLA
    attention path — the chunked kernel measured slower there and its
    compilation beside the big 1024² graph trips the remote compile
    helper's memory cap (BASELINE.md r2).  Small-grid stages keep the
    kernel at any image size.
    """
    if not flag:
        return False
    # at 1024²+ even the 19-window single-program bodies broke the
    # compile cap; below that, anything the op-level gate accepts works
    cap = 10 if img_size >= 1024 else 20
    grids = [img_size // patch // (2 ** i) for i in range(n_stages)]
    per = tuple((g + (-g % window)) // window <= cap for g in grids)
    return True if all(per) else per


def attention_plan(model) -> List[str]:
    """Per-stage kernel execution paths, for logs and dry runs.

    Reports, for each encoder stage's token grid, which attention op
    runs (fused Pallas kernel vs XLA) and — under a data-parallel mesh —
    that kernels are shard_mapped over the data axis (kernel custom
    calls are not GSPMD-partitioned).
    """
    from ..ops import fused_window_attention as fwa

    lines: List[str] = []
    n_stages = len(model.depths)
    grids = [model.img_size // model.patch_size // (2 ** i)
             for i in range(n_stages)]
    dims = [model.embed_dim * 2 ** i for i in range(n_stages)]
    mesh = getattr(model, "data_mesh", None)
    axis = getattr(model, "data_axis", "data")
    dp = mesh.shape.get(axis, 1) if mesh is not None else 1
    window = (model.window_size, model.window_size)

    def _dp_suffix(interpret: bool) -> str:
        if dp > 1:
            return f" (shard_map over '{axis}'x{dp})"
        if interpret:
            return " (interpret)"
        return ""

    sharded = bool(model.spatial_axis or getattr(model, "model_axis", ""))
    for i in range(n_stages):
        shape = (1, grids[i], grids[i], dims[i])
        flag = model.use_pallas
        if isinstance(flag, (tuple, list)):
            flag = bool(flag[i])
        active = (
            bool(flag)
            and not sharded
            and fwa.supported(shape, window, model.num_heads[i],
                              dtype=getattr(model, "dtype", None))
        )
        if active:
            path = "pallas-kernel" + _dp_suffix(fwa.INTERPRET)
        else:
            f32_wide = (flag and not sharded
                        and getattr(model, "dtype", None) is not None
                        and jnp.dtype(model.dtype).itemsize >= 4
                        and fwa.supported(shape, window,
                                          model.num_heads[i]))
            reason = ("spatial sharding" if model.spatial_axis
                      else "tensor parallel"
                      if getattr(model, "model_axis", "")
                      else "f32 wide strip (scoped vmem)" if f32_wide
                      else "unsupported shape/backend" if flag
                      else "disabled")
            path = f"xla ({reason})"
        lines.append(
            f"attention stage {i}: grid {grids[i]}x{grids[i]} c{dims[i]} "
            f"-> {path}"
        )
    if getattr(model, "use_fused_patch", False):
        from ..ops import fused_patch as fpa

        if sharded:
            lines.append("patch merge/expand: xla (sharded)")
        else:
            m_ok = [c for g, c in zip(grids[:-1], dims[:-1])
                    if fpa.merge_supported((1, g, g, c))]
            e_ok = [c for g, c in zip(grids[1:], dims[1:])
                    if fpa.expand_supported((1, g, g, c))]
            if m_ok or e_ok:
                lines.append(
                    f"patch merge/expand: fused-patch kernel (merge c"
                    f"{m_ok}, expand c{e_ok})"
                    f"{_dp_suffix(fpa.INTERPRET)}"
                )
            else:
                lines.append(
                    "patch merge/expand: xla (unsupported shape/backend)")
    return lines


class MSUNetSys(nn.Module):
    """The MS-UNet graph. See module docstring for the wiring contract."""

    img_size: int = 1024
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_remat: bool = False
    remat_high_res: bool = False  # remat only blocks with dim <= 256
    remat_policy: str = ""  # "" (full) | "dots" (save matmuls, recompute rest)
    # fused Pallas attention: bool for all stages, or a per-stage tuple
    # (indexed by encoder stage; decoder/cent layers follow the stage of
    # their dim) — 1024²+ uses (False, False, True, True): wide grids
    # stay on XLA (see ops/fused_window_attention.supported + BASELINE.md)
    use_pallas: Union[bool, Tuple[bool, ...]] = False
    use_fused_patch: bool = False  # fused merge/expand relayout kernels
    window_group: int = 0  # windows per attention matmul (0 => auto)
    hold_layout: bool = False  # keep window-major layout across a stage's blocks
    gelu_tanh: bool = False  # tanh GELU (fast) vs exact erf (reference parity)
    fused_head: bool = False  # Pallas fused GELU+depth-to-space in up_x4
    # mesh axis name for spatial (token-grid H) sharding; "" = off.  When
    # set, activations get sharding constraints at stage boundaries and
    # XLA SPMD inserts the halo collectives (windows/shifts/merges/convs).
    # Pallas kernels are bypassed in this mode (custom calls aren't
    # auto-partitioned).
    spatial_axis: str = ""
    # mesh axis name the PARAMETERS are tensor-parallel-sharded over
    # (parallel/tp.py's Megatron placements); "" = params replicated.
    # When set, Pallas kernels are bypassed for the same reason as
    # spatial sharding: the kernels are custom calls GSPMD cannot
    # partition, and their weights are no longer whole per device —
    # the XLA path lets GSPMD insert the TP collectives instead.
    model_axis: str = ""
    # mesh for data-parallel training: Pallas kernels run per-shard under
    # shard_map over `data_axis` (custom calls are not GSPMD-partitioned);
    # set by the trainer via model.clone(data_mesh=mesh) when N_GPU > 1
    data_mesh: Optional[object] = None
    data_axis: str = "data"
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def _stage_remat(self, dim: int) -> bool:
        return self.use_remat or (self.remat_high_res and dim <= 256)

    def _stage_pallas(self, dim: int) -> bool:
        """Fused-attention choice for the stage owning ``dim``."""
        if not self.use_pallas or self.spatial_axis or self.model_axis:
            return False
        if isinstance(self.use_pallas, (tuple, list)):
            i = (dim // self.embed_dim).bit_length() - 1
            return bool(self.use_pallas[i])
        return True

    def _sc(self, x: jax.Array) -> jax.Array:
        """Spatial sharding constraint on the H axis of an NHWC map."""
        if not self.spatial_axis:
            return x
        from jax.sharding import PartitionSpec as P

        spec = P(*([None, self.spatial_axis] + [None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, spec)

    def setup(self):
        nl = len(self.depths)  # num layers (4)
        dims = [self.embed_dim * 2**i for i in range(nl)]
        dpr = _dpr(self.drop_path_rate, self.depths)
        sharded = bool(self.spatial_axis or self.model_axis)
        fused_patch_on = self.use_fused_patch and not sharded
        common = dict(
            window_size=self.window_size,
            use_fused_patch=fused_patch_on,
            data_mesh=self.data_mesh,
            data_axis=self.data_axis,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            remat_policy=self.remat_policy,
            window_group=self.window_group,
            hold_layout=self.hold_layout,
            gelu_tanh=self.gelu_tanh,
            softmax_dtype=self.softmax_dtype,
            dtype=self.dtype,
        )

        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            patch_norm=self.patch_norm,
            dtype=self.dtype,
            name="patch_embed",
        )
        self.pos_drop = nn.Dropout(self.drop_rate)

        # ---- encoder ----------------------------------------------------
        self.layers = [
            BasicLayer(
                dim=dims[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                drop_path=_stage_slice(dpr, self.depths, i),
                downsample=(i < nl - 1),
                use_remat=self._stage_remat(dims[i]),
                use_pallas=self._stage_pallas(dims[i]),
                name=f"layers_{i}",
                **common,
            )
            for i in range(nl)
        ]

        # ---- shared skip-reduction linears ------------------------------
        # concat_back_dim[i]: Linear(2*dims[nl-1-i] -> dims[nl-1-i]); i=0 is
        # identity in the reference and never used.
        self.concat_back_dim = [None] + [
            nn.Dense(
                dims[nl - 1 - i],
                kernel_init=trunc_normal_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"concat_back_dim_{i}",
            )
            for i in range(1, nl)
        ]

        # ---- main decoder ------------------------------------------------
        layers_up: list = [
            PatchExpand(dim=dims[nl - 1], use_fused_patch=fused_patch_on,
                        data_mesh=self.data_mesh, data_axis=self.data_axis,
                        dtype=self.dtype, name="layers_up_0")
        ]
        for i in range(1, nl):
            s = nl - 1 - i  # mirrored encoder stage
            layers_up.append(
                BasicLayerUp(
                    dim=dims[s],
                    depth=self.depths[s],  # encoder depths reused (quirk kept)
                    num_heads=self.num_heads[s],
                    drop_path=_stage_slice(dpr, self.depths, s),
                    upsample=(i < nl - 1),
                    use_remat=self._stage_remat(dims[s]),
                    use_pallas=self._stage_pallas(dims[s]),
                    name=f"layers_up_{i}",
                    **common,
                )
            )
        self.layers_up = layers_up

        # ---- cent decoder 1 (fires at encoder stage 2) -------------------
        # stages: PatchExpand(512@64²), BL_up(256@128², upsample),
        #         BL_up(128@256², no upsample)
        cent1: list = [
            PatchExpand(dim=dims[nl - 2], use_fused_patch=fused_patch_on,
                        data_mesh=self.data_mesh, data_axis=self.data_axis,
                        dtype=self.dtype, name="layers_cent1_0")
        ]
        for i in range(1, nl - 1):
            s = nl - 2 - i
            cent1.append(
                BasicLayerUp(
                    dim=dims[s],
                    depth=self.depths[s],
                    num_heads=self.num_heads[s],
                    drop_path=_stage_slice(dpr, self.depths, s),
                    upsample=(i < nl - 2),
                    use_remat=self._stage_remat(dims[s]),
                    use_pallas=self._stage_pallas(dims[s]),
                    name=f"layers_cent1_{i}",
                    **common,
                )
            )
        self.layers_cent1 = cent1

        # ---- cent decoder 2 (fires at encoder stage 1) -------------------
        # stages: PatchExpand(256@128²), BL_up(128@256², no upsample)
        cent2: list = [
            PatchExpand(dim=dims[nl - 3], use_fused_patch=fused_patch_on,
                        data_mesh=self.data_mesh, data_axis=self.data_axis,
                        dtype=self.dtype, name="layers_cent2_0")
        ]
        for i in range(1, nl - 2):
            s = nl - 3 - i
            cent2.append(
                BasicLayerUp(
                    dim=dims[s],
                    depth=self.depths[s],
                    num_heads=self.num_heads[s],
                    drop_path=_stage_slice(dpr, self.depths, s),
                    upsample=(i < nl - 3),
                    use_remat=self._stage_remat(dims[s]),
                    use_pallas=self._stage_pallas(dims[s]),
                    name=f"layers_cent2_{i}",
                    **common,
                )
            )
        self.layers_cent2 = cent2

        self.norm = layer_norm("norm", self.dtype)
        self.norm_up = layer_norm("norm_up", self.dtype)
        self.up = FinalPatchExpandX4V2(
            dim=self.embed_dim, gelu_tanh=self.gelu_tanh,
            # spatial sharding bypasses ALL Pallas kernels (custom calls
            # aren't auto-partitioned), the head one included
            fused_head=self.fused_head and not (self.spatial_axis
                                                or self.model_axis),
            data_mesh=self.data_mesh, data_axis=self.data_axis,
            dtype=self.dtype, name="up",
        )
        # 1x1 projection as a dot_general — see PointwiseConv: the
        # conv_general_dilated lowering costs ~14 ms/step in relayout
        # copies at 512^2 (r4 hlo_breakdown) for this 0.5-GFLOP op.
        self.output = PointwiseConv(
            self.num_classes, dtype=self.dtype, name="output",
        )

    # -- encoder with in-pass cent decoders --------------------------------
    def forward_features(self, x, deterministic):
        x = self._sc(self.patch_embed(x))
        x = self.pos_drop(x, deterministic=deterministic)
        skips: List[jax.Array] = []
        nl = len(self.depths)
        for i_layer in range(nl):
            if i_layer == 1:
                # cent decoder 2: rewrite skip 0 (reference :785-795)
                x2 = x
                for i, stage in enumerate(self.layers_cent2):
                    if i == 0:
                        x2 = stage(x2)
                    else:
                        x2 = jnp.concatenate([x2, skips[i_layer - i]], axis=-1)
                        x2 = self.concat_back_dim[i + 2](x2)
                        skips[i_layer - i] = x2
                        x2 = stage(x2, deterministic)
            if i_layer == 2:
                # cent decoder 1: rewrite skips 1 and 0 (reference :797-807)
                x1 = x
                for i, stage in enumerate(self.layers_cent1):
                    if i == 0:
                        x1 = stage(x1)
                    else:
                        x1 = jnp.concatenate([x1, skips[i_layer - i]], axis=-1)
                        x1 = self.concat_back_dim[i + 1](x1)
                        skips[i_layer - i] = x1
                        x1 = stage(x1, deterministic)
            skips.append(x)
            x = self._sc(self.layers[i_layer](x, deterministic))
        x = self.norm(x)
        return x, skips

    # -- main decoder -------------------------------------------------------
    def forward_up_features(self, x, skips, deterministic):
        nl = len(self.depths)
        for inx, layer_up in enumerate(self.layers_up):
            if inx == 0:
                x = self._sc(layer_up(x))
            else:
                x = jnp.concatenate([x, skips[nl - 1 - inx]], axis=-1)
                x = self.concat_back_dim[inx](x)
                x = self._sc(layer_up(x, deterministic))
        x = self.norm_up(x)
        return x

    # -- final ×4 upsample + head ------------------------------------------
    def up_x4(self, x):
        x = self.up(x)
        x = self.output(x)
        return x

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """``(B, H, W, 3) -> (B, H, W, num_classes)`` logits (NHWC)."""
        b, h, w, c = x.shape
        if h != self.img_size or w != self.img_size:
            raise ValueError(
                f"Input image size ({h}*{w}) doesn't match model "
                f"({self.img_size}*{self.img_size})."
            )
        x, skips = self.forward_features(x, deterministic)
        x = self.forward_up_features(x, skips, deterministic)
        x = self.up_x4(x)
        return x


class MSUNet(nn.Module):
    """Thin wrapper validating 3-channel input (reference ``MSUNet.py:16-58``).

    Construct with :func:`from_config` to read the reference config schema.
    """

    img_size: int = 1024
    num_classes: int = 1
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_remat: bool = False
    remat_high_res: bool = False
    remat_policy: str = ""
    use_pallas: Union[bool, Tuple[bool, ...]] = False
    use_fused_patch: bool = False  # fused merge/expand relayout kernels
    window_group: int = 0  # windows per attention matmul (0 => auto)
    hold_layout: bool = False  # keep window-major layout across a stage's blocks
    gelu_tanh: bool = False  # tanh GELU (fast) vs exact erf (reference parity)
    fused_head: bool = False  # Pallas fused GELU+depth-to-space in up_x4
    spatial_axis: str = ""  # mesh axis for token-grid H sharding ("" = off)
    model_axis: str = ""  # mesh axis params are TP-sharded over ("" = off)
    data_mesh: Optional[object] = None  # DP mesh for per-shard Pallas kernels
    data_axis: str = "data"
    softmax_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, config, img_size=None, num_classes=None, dtype=None):
        """Build from a frozen config (knob names per reference schema)."""
        swin = config.MODEL.SWIN
        compute_dtype = dtype
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16
                if str(config.TPU.COMPUTE_DTYPE) == "bfloat16"
                else jnp.float32
            )
        remat_mode = str(config.TPU.REMAT)
        size = img_size or config.DATA.IMG_SIZE
        # the kernel falls back to the XLA attention path in TRAINING
        # whenever a dropout rng is needed (WindowAttention), so the
        # memory-policy decision below must key on the effective state,
        # not just the flag
        kernel_in_train = (
            bool(config.TPU.USE_PALLAS_ATTENTION)
            and float(config.MODEL.ATTN_DROP_RATE) == 0.0
            and float(config.MODEL.DROP_RATE) == 0.0
        )
        if remat_mode == "auto":
            # r2 sweeps at 1024² batch 2 (BASELINE.md): with the mixed
            # fused-attention kernel, none 5.35 > high_res 5.33; on the
            # pure XLA path high_res 5.32 > none 5.16 (the kernel's
            # flash bwd is what removes the memory pressure).
            if size >= 1024:
                remat_mode = "none" if kernel_in_train else "high_res"
            else:
                remat_mode = "none"
        remat = bool(config.TRAIN.USE_CHECKPOINT) or remat_mode in (
            "full", "dots")
        remat_high = remat_mode == "high_res"
        remat_policy = "dots" if remat_mode == "dots" else ""

        return cls(
            img_size=img_size or config.DATA.IMG_SIZE,
            num_classes=num_classes or config.MODEL.NUM_CLASSES,
            patch_size=swin.PATCH_SIZE,
            in_chans=swin.IN_CHANS,
            embed_dim=swin.EMBED_DIM,
            depths=tuple(swin.DEPTHS),
            num_heads=tuple(swin.NUM_HEADS),
            window_size=swin.WINDOW_SIZE,
            mlp_ratio=float(swin.MLP_RATIO),
            qkv_bias=bool(swin.QKV_BIAS),
            drop_rate=float(config.MODEL.DROP_RATE),
            attn_drop_rate=float(config.MODEL.ATTN_DROP_RATE),
            drop_path_rate=float(config.MODEL.DROP_PATH_RATE),
            patch_norm=bool(swin.PATCH_NORM),
            use_remat=remat,
            remat_high_res=remat_high,
            remat_policy=remat_policy,
            use_pallas=_pallas_stages(
                bool(config.TPU.USE_PALLAS_ATTENTION), size,
                swin.PATCH_SIZE, len(swin.DEPTHS), swin.WINDOW_SIZE),
            window_group=int(getattr(config.TPU, "ATTN_WINDOW_GROUP", 0)),
            hold_layout=bool(getattr(config.TPU, "HOLD_WINDOW_LAYOUT", False)),
            gelu_tanh=bool(getattr(config.TPU, "GELU_TANH", False)),
            fused_head=bool(getattr(config.TPU, "FUSED_HEAD", False)),
            use_fused_patch=bool(getattr(config.TPU, "FUSED_PATCH", False)),
            spatial_axis=str(getattr(config.TPU, "SPATIAL_AXIS", "")),
            model_axis=str(getattr(config.TPU, "MODEL_AXIS", "")),
            softmax_dtype=(jnp.bfloat16
                           if str(config.TPU.SOFTMAX_DTYPE) == "bfloat16"
                           else jnp.float32),
            dtype=compute_dtype,
        )

    def setup(self):
        self.msunet = MSUNetSys(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            patch_norm=self.patch_norm,
            use_remat=self.use_remat,
            remat_high_res=self.remat_high_res,
            remat_policy=self.remat_policy,
            use_pallas=self.use_pallas,
            use_fused_patch=self.use_fused_patch,
            window_group=self.window_group,
            hold_layout=self.hold_layout,
            gelu_tanh=self.gelu_tanh,
            fused_head=self.fused_head,
            spatial_axis=self.spatial_axis,
            model_axis=self.model_axis,
            data_mesh=self.data_mesh,
            data_axis=self.data_axis,
            softmax_dtype=self.softmax_dtype,
            dtype=self.dtype,
            name="msunet",
        )

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if x.shape[-1] != 3:
            raise ValueError(f"Expected 3-channel NHWC input, got {x.shape}")
        return self.msunet(x, deterministic)
