"""Tensor-parallel parameter sharding rules (hybrid DP×TP).

Megatron-style sharding of the transformer matmuls over the ``model``
mesh axis, expressed as `NamedSharding` placements on the parameter tree;
XLA GSPMD propagates activations shardings and inserts the collectives
(all-gather/reduce-scatter over ICI):

* ``attn/qkv`` kernel: output (3C) dim sharded — heads split across TP
  ranks (column parallel),
* ``attn/proj`` kernel: input dim sharded (row parallel),
* ``mlp/fc1`` kernel: output (4C hidden) dim sharded (column parallel),
* ``mlp/fc2`` kernel: input dim sharded (row parallel),
* biases of column-parallel layers shard on their only dim; row-parallel
  biases and everything else (norms, tables, convs, patch ops) replicate.

The batch stays sharded on ``data``.  This is a stretch capability beyond
the reference (whose only strategy was DataParallel); the MS-UNet's
matmuls are modest, so TP mainly buys activation-memory headroom at
1024², not throughput.

When TP-sharding a model that has Pallas kernels enabled, set
``model.clone(model_axis="model")``: the kernels are custom calls GSPMD
cannot partition and their weights are no longer whole per device, so
the model must route those blocks to the XLA path (mirrors the
``spatial_axis`` bypass; see ``MSUNetSys.model_axis``).
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _tp_spec(path: Tuple[str, ...], leaf) -> P:
    joined = "/".join(path)
    ndim = getattr(leaf, "ndim", 0)
    if "attn/qkv/kernel" in joined or "mlp/fc1/kernel" in joined:
        return P(None, "model")  # column parallel
    if "attn/qkv/bias" in joined or "mlp/fc1/bias" in joined:
        return P("model")
    if "attn/proj/kernel" in joined or "mlp/fc2/kernel" in joined:
        return P("model", None)  # row parallel
    return P()  # replicated


def shard_params_tp(params, mesh: Mesh):
    """Place a parameter tree with the TP rules over ``mesh``."""
    flat = traverse_util.flatten_dict(params)
    placed = {
        k: jax.device_put(v, NamedSharding(mesh, _tp_spec(k, v)))
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(placed)


def shard_state_tp(state, mesh: Mesh):
    """TP-shard a TrainState: params + matching optimizer moments.

    Adam's m/v have the same tree structure as params, so the same specs
    apply; scalar counts and hyperparams replicate.
    """
    new_params = shard_params_tp(state.params, mesh)

    def place_like_params(tree):
        try:
            flat = traverse_util.flatten_dict(tree)
        except AssertionError:
            return tree
        placed = {}
        for k, v in flat.items():
            if hasattr(v, "shape") and v.ndim > 0:
                placed[k] = jax.device_put(
                    v, NamedSharding(mesh, _tp_spec(k, v)))
            else:
                placed[k] = v
        return traverse_util.unflatten_dict(placed)

    def walk(node):
        # optimizer states are namedtuples/dataclasses containing param-
        # shaped dicts; recurse shallowly
        if isinstance(node, dict):
            return place_like_params(node)
        if hasattr(node, "_fields"):  # namedtuple
            return type(node)(*(walk(x) for x in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(x) for x in node)
        if hasattr(node, "shape") and getattr(node, "ndim", 0) == 0:
            return jax.device_put(node, NamedSharding(mesh, P()))
        return node

    new_opt = walk(state.opt_state)
    return state.replace(params=new_params, opt_state=new_opt)
