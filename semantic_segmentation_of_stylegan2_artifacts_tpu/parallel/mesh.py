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
) -> Mesh:
    """Mesh with axes ('data', 'model'); defaults to all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {use} devices, have {len(devices)}"
        )
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
