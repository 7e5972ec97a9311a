"""Optimizer construction: AdamW with decay/no-decay split + encoder freeze.

Replicates the reference's parameter grouping (reference
``trainer.py:129-152``): parameters with ``ndim == 1``, named ``*.bias``
or containing ``norm`` get weight_decay 0; everything else gets
``TRAIN.WEIGHT_DECAY``.  The learning rate is injected per-epoch (the
reference steps a timm scheduler once per epoch), via
``optax.inject_hyperparams``.

Encoder freezing (reference ``MSUNet.freeze_encoder`` /
``unfreeze_encoder``, ``model_parts.py:867-893``) maps to an
``optax.multi_transform`` over {trainable, frozen} labels; frozen leaves
get ``set_to_zero`` so no state or update is carried.
"""

from __future__ import annotations

from typing import Optional, Set, Tuple

import optax
from flax import traverse_util


def decay_mask_fn(params) -> dict:
    """True => apply weight decay (mirrors trainer.py:137 inverse)."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: getattr(v, "ndim", 0) > 1 and ("norm" not in "/".join(k).lower())
        and (k[-1] != "bias")
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(mask)


def freeze_labels(params, frozen_stages: Set[int], freeze_patch_embed: bool):
    """'frozen' / 'trainable' label tree for multi_transform.

    ``frozen_stages``: encoder stage indices currently frozen; patch_embed
    follows stage 0 in the reference's unfreeze order.
    """
    flat = traverse_util.flatten_dict(params)

    def label(k):
        for part in k:
            if part == "patch_embed" and freeze_patch_embed:
                return "frozen"
            if part.startswith("layers_") and not part.startswith(
                ("layers_up", "layers_cent")
            ):
                stage = int(part.split("_")[-1])
                if stage in frozen_stages:
                    return "frozen"
        return "trainable"

    return traverse_util.unflatten_dict({k: label(k) for k in flat})


def build_optimizer(
    config,
    params,
    frozen_stages: Optional[Set[int]] = None,
    freeze_patch_embed: Optional[bool] = None,
):
    """AdamW(+freeze) optax chain; lr is a hyperparam injected per epoch."""
    betas = tuple(config.TRAIN.OPTIMIZER.BETAS)

    adamw = optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
        learning_rate=float(config.TRAIN.BASE_LR),
        b1=betas[0],
        b2=betas[1],
        eps=float(config.TRAIN.OPTIMIZER.EPS),
        weight_decay=float(config.TRAIN.WEIGHT_DECAY),
        mask=decay_mask_fn,
    )

    frozen_stages = frozen_stages or set()
    if freeze_patch_embed is None:
        freeze_patch_embed = 0 in frozen_stages
    if not frozen_stages and not freeze_patch_embed:
        return adamw

    labels = freeze_labels(params, frozen_stages, freeze_patch_embed)
    return optax.multi_transform(
        {"trainable": adamw, "frozen": optax.set_to_zero()}, labels
    )


def carry_opt_state(old_state, new_state):
    """Preserve optimizer state across a freeze-set rebuild.

    ``optax.multi_transform`` masks frozen leaves out of the Adam moment
    trees (``MaskedNode``), so rebuilding after an unfreeze yields fresh
    zero moments for *every* parameter.  The reference's intended
    semantics are torch ``add_param_group`` (reference ``trainer.py:
    252-288``, commented out): existing groups keep their moments and
    step counts; only the newly added group starts cold.

    This merges leaf-by-leaf by keypath: any leaf addressable in both
    states (same path, shape, dtype) is taken from ``old_state`` —
    moments of long-trainable params, step counts, injected
    hyperparams — while leaves that only exist in ``new_state`` (the
    newly unfrozen stage's moments, masked out before) keep their fresh
    zero init.  Handles the wrapper change on full unfreeze, where
    ``build_optimizer`` returns a bare (non-multi_transform) chain.
    """
    from jax import tree_util as jtu

    old_cmp = old_state
    if hasattr(old_state, "inner_states") and not hasattr(
        new_state, "inner_states"
    ):
        # full unfreeze: the multi_transform wrapper disappears — compare
        # against the old 'trainable' branch at the same altitude
        old_cmp = old_state.inner_states["trainable"].inner_state

    old_leaves = {
        jtu.keystr(path): leaf
        for path, leaf in jtu.tree_flatten_with_path(old_cmp)[0]
    }

    def merge(path, leaf):
        prev = old_leaves.get(jtu.keystr(path))
        if (
            prev is not None
            and getattr(prev, "shape", None) == getattr(leaf, "shape", None)
            and getattr(prev, "dtype", None) == getattr(leaf, "dtype", None)
        ):
            return prev
        return leaf

    return jtu.tree_map_with_path(merge, new_state)


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected learning_rate replaced.

    Works for both the bare inject_hyperparams state and the
    multi_transform-wrapped variant.
    """
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = lr
        return opt_state
    if hasattr(opt_state, "inner_states"):
        inner = opt_state.inner_states["trainable"].inner_state
        if hasattr(inner, "hyperparams"):
            inner.hyperparams["learning_rate"] = lr
        return opt_state
    raise ValueError("Unrecognized optimizer state structure")


def current_learning_rate(opt_state) -> float:
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    if hasattr(opt_state, "inner_states"):
        return float(
            opt_state.inner_states["trainable"].inner_state.hyperparams[
                "learning_rate"
            ]
        )
    raise ValueError("Unrecognized optimizer state structure")
