"""PyTorch checkpoint -> flax params conversion.

Three capabilities, mirroring the reference's weight ingestion
(reference ``network/MSUNet.py:61-229``):

* :func:`convert_msunet_state_dict` — full reference-model state_dict
  (the ``best_model.pth`` payloads the reference trainer saves) to this
  framework's parameter tree, so reference-trained checkpoints evaluate
  here for parity,
* :func:`load_pretrained_encoder` — SegFace (``backbone.0.*``,
  ``state_dict_backbone``) and torchvision ImageNet1k (``features.*``)
  Swin-B encoder checkpoints remapped onto the encoder params, with the
  reference's exact prefix tables and shape validation,
* :func:`torch_key_to_flax_path` — the mechanical key translation
  (dots -> module names, weight transposes for Linear/Conv).

torch is only needed when actually loading ``.pt``/``.pth`` files; the
key mapping itself is pure string/numpy work.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
from flax import traverse_util


# ---------------------------------------------------------------------------
# Key translation: reference-model key space -> flax path
# ---------------------------------------------------------------------------
def torch_key_to_flax_path(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Translate one reference-model key to (flax path, transform).

    transform in {"linear_t", "conv_t", "copy"}; returns None for keys
    with no flax counterpart (buffers like relative_position_index).
    """
    if key.endswith("relative_position_index"):
        return None  # static in this implementation
    if key.endswith("attn_mask"):
        return None

    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        # module-list indices: layers.0 -> layers_0 (also layers_up,
        # layers_cent1/2, concat_back_dim, blocks)
        if p in ("layers", "layers_up", "layers_cent1", "layers_cent2",
                 "concat_back_dim", "blocks") and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        # torchvision MLP sequential indices -> fc1/fc2
        if p == "mlp" and i + 1 < len(parts) and parts[i + 1] in ("0", "3"):
            out.append("mlp")
            out.append("fc1" if parts[i + 1] == "0" else "fc2")
            i += 2
            continue
        out.append(p)
        i += 1

    leaf = out[-1]
    module_path = out[:-1]
    mod = module_path[-1] if module_path else ""

    is_norm = mod.startswith("norm") or (
        len(module_path) >= 1 and module_path[-1] == "norm"
    )
    if leaf == "weight":
        if is_norm:
            return tuple(module_path + ["scale"]), "copy"
        if mod in ("proj", "refine1", "refine2", "output") and (
            "patch_embed" in module_path or mod in ("refine1", "refine2",
                                                    "output")
        ):
            # Conv2d weights (patch_embed.proj, up.refine*, output head)
            return tuple(module_path + ["kernel"]), "conv_t"
        # Linear weights (qkv, attn proj, mlp, reduction, expand,
        # concat_back_dim)
        return tuple(module_path + ["kernel"]), "linear_t"
    if leaf == "bias":
        return tuple(module_path + ["bias"]), "copy"
    if leaf == "relative_position_bias_table":
        return tuple(out), "copy"
    # unknown leaf: pass through
    return tuple(out), "copy"


def _apply_transform(value: np.ndarray, transform: str) -> np.ndarray:
    if transform == "linear_t":
        return np.ascontiguousarray(value.T)
    if transform == "conv_t":
        # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
        return np.ascontiguousarray(value.transpose(2, 3, 1, 0))
    return value


def convert_msunet_state_dict(state_dict: Dict[str, "np.ndarray"],
                              params: Dict, logging=None,
                              strict_shapes: bool = True) -> Dict:
    """Merge a reference-model state_dict into a flax params tree.

    ``params`` is the initialized tree (``{'msunet': {...}}`` at top
    level); returns a new tree with matched leaves replaced.
    """
    flat = dict(traverse_util.flatten_dict(params))
    root_prefix: Tuple[str, ...] = ()
    if "msunet" in params:
        root_prefix = ("msunet",)

    replaced = 0
    skipped = []
    for k, v in state_dict.items():
        v = np.asarray(v)
        mapped = torch_key_to_flax_path(k)
        if mapped is None:
            continue
        path, transform = mapped
        full = root_prefix + path
        if full not in flat:
            skipped.append(k)
            continue
        new_v = _apply_transform(v, transform)
        if flat[full].shape != new_v.shape:
            msg = (f"Key {k} does not match: checkpoint {new_v.shape} vs "
                   f"model {flat[full].shape}")
            if strict_shapes:
                raise ValueError(msg)
            if logging:
                logging.warning(msg)
            continue
        flat[full] = new_v.astype(np.asarray(flat[full]).dtype)
        replaced += 1
    if logging:
        logging.info(
            f"weight_convert: {replaced} tensors loaded, "
            f"{len(skipped)} checkpoint keys without model counterpart"
        )
    return traverse_util.unflatten_dict(flat)


# ---------------------------------------------------------------------------
# Encoder-pretrain remapping tables (reference MSUNet.py:86-122, 169-199)
# ---------------------------------------------------------------------------
_SEGFACE_PREFIX_MAP = [
    ("backbone.0.0.0.", "patch_embed.proj."),
    ("backbone.0.0.2.", "patch_embed.norm."),
    ("backbone.0.1.0.", "layers.0.blocks.0."),
    ("backbone.0.1.1.", "layers.0.blocks.1."),
    ("backbone.0.2.", "layers.0.downsample."),
    ("backbone.0.3.0.", "layers.1.blocks.0."),
    ("backbone.0.3.1.", "layers.1.blocks.1."),
    ("backbone.0.4.", "layers.1.downsample."),
    *[(f"backbone.0.5.{i}.", f"layers.2.blocks.{i}.") for i in range(18)],
    ("backbone.0.6.", "layers.2.downsample."),
    ("backbone.0.7.0.", "layers.3.blocks.0."),
    ("backbone.0.7.1.", "layers.3.blocks.1."),
]

_IMAGENET1K_PREFIX_MAP = [
    ("features.0.0.", "patch_embed.proj."),
    ("features.0.2.", "patch_embed.norm."),
    ("features.1.0.", "layers.0.blocks.0."),
    ("features.1.1.", "layers.0.blocks.1."),
    ("features.2.", "layers.0.downsample."),
    ("features.3.0.", "layers.1.blocks.0."),
    ("features.3.1.", "layers.1.blocks.1."),
    ("features.4.", "layers.1.downsample."),
    *[(f"features.5.{i}.", f"layers.2.blocks.{i}.") for i in range(18)],
    ("features.6.", "layers.2.downsample."),
    ("features.7.0.", "layers.3.blocks.0."),
    ("features.7.1.", "layers.3.blocks.1."),
]


def remap_encoder_keys(state_dict: Dict, kind: str, logging=None) -> Dict:
    """Apply the SegFace/ImageNet1k prefix tables -> reference key space."""
    if kind == "segface":
        table, root = _SEGFACE_PREFIX_MAP, "backbone"
    elif kind == "imagenet1k":
        table, root = _IMAGENET1K_PREFIX_MAP, "features"
    else:
        raise ValueError(f"unknown pretrain kind: {kind}")

    # longest-prefix-first so features.5.1x matches before features.5.1
    table = sorted(table, key=lambda kv: -len(kv[0]))
    out = {}
    matched_root = False
    for k, v in state_dict.items():
        if not k.startswith(root):
            continue
        matched_root = True
        if kind == "segface" and k.startswith("backbone.1."):
            continue  # decode head of the face parser: skipped (ref :117-118)
        for src, dst in table:
            if k.startswith(src):
                out[dst + k[len(src):]] = v
                break
        else:
            # torchvision ImageNet1k head keys (norm., head.) are outside
            # `features` so anything unmatched inside the root is an error
            raise ValueError(f"Key {k} not found in dictionary!!")
    if not matched_root:
        raise ValueError("No new keys from backbone!!")
    return out


def load_torch_state_dict(path: str):
    """Load a .pt/.pth with torch (cpu) and return numpy-ified flat dict."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict):
        for key in ("state_dict_backbone", "model", "state_dict"):
            if key in payload and isinstance(payload[key], dict):
                payload = payload[key]
                break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in payload.items() if hasattr(v, "shape")}


def load_pretrained_encoder(params: Dict, ckpt_path: str, kind: str,
                            logging=None) -> Dict:
    """Full flow: torch file -> encoder remap -> flax merge.

    Mirrors the reference's behavior of *returning unchanged* when the
    file is absent (reference ``MSUNet.py:65-67``) but logs loudly.
    """
    if not ckpt_path or not os.path.exists(ckpt_path):
        if logging:
            logging.error(f"No {kind} pretrain found at: {ckpt_path}")
        return params
    sd = load_torch_state_dict(ckpt_path)
    remapped = remap_encoder_keys(sd, kind, logging)
    merged = convert_msunet_state_dict(remapped, params, logging,
                                       strict_shapes=True)
    if logging:
        logging.info(f"End of the {kind} pretrained copying process")
    return merged
