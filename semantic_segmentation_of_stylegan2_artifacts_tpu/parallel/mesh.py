"""Device mesh + sharding rules (SPMD data parallelism over ICI).

The reference's only multi-device strategy is single-process
``nn.DataParallel`` (reference ``trainer.py:96-97``).  The TPU-native
equivalent: a ``jax.sharding.Mesh`` over the slice with the batch sharded
on the ``data`` axis and parameters/optimizer state replicated.  Under
``jax.jit`` XLA turns the replicated-parameter gradient reduction into a
``psum`` over ICI — DataParallel semantics (identical params every step)
without any host-side scatter/gather.

A ``model`` axis is provisioned for tensor-parallel sharding of the
attention/MLP matmuls (stretch; size 1 by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    n_space: int = 1,
) -> Mesh:
    """Mesh with axes ('data', 'model'[, 'space']); defaults all on data.

    ``n_space > 1`` adds a third axis for spatial (token-grid H)
    sharding — the sequence-parallel analog for this model family
    (SURVEY §5 long-context): activations carry
    ``with_sharding_constraint(P(None, 'space', ...))`` annotations at
    stage boundaries (``MSUNetSys.spatial_axis``) and XLA's SPMD
    partitioner inserts the halo/permute collectives for windows,
    shifts, merges and the 3x3 head convs.
    """
    devices = list(devices if devices is not None else jax.devices())
    per = n_model * n_space
    if n_data is None or n_data <= 0:
        n_data = len(devices) // per
    use = n_data * per
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model}x{n_space} needs {use} devices, "
            f"have {len(devices)}"
        )
    if n_space > 1:
        arr = np.array(devices[:use]).reshape(n_data, n_model, n_space)
        return Mesh(arr, axis_names=("data", "model", "space"))
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place host numpy batch arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a train state (params + opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, state
    )
