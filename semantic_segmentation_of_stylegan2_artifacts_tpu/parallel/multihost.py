"""Multi-host (pod-slice) input sharding and batch assembly.

The reference is strictly single-process (``nn.DataParallel``, reference
``trainer.py:96-97``).  On a TPU pod slice, JAX runs one process per
host, each owning ``jax.local_device_count()`` chips.  The SPMD recipe:

* every host runs the SAME jitted train step over the global
  ``jax.sharding.Mesh`` (all devices, all hosts);
* the input pipeline is *host-sharded*: each process decodes only its
  slice of every global batch
  (``TrainLoader.epoch_batches_merged(..., shard=(pi, pc))`` — the
  index-level epoch plan is deterministic per ``(seed, epoch)``, so all
  hosts agree on the global plan without communication);
* :func:`make_global_batch` assembles the per-host local arrays into
  one global batch-sharded ``jax.Array`` via
  ``jax.make_array_from_process_local_data`` — no cross-host data
  movement, each shard lands on the host that decoded it.

Communication layout: the gradient ``psum`` over the ``data`` axis is
inserted by XLA.  Within a slice it rides ICI; across slices (multislice
with ``MegaScale``) XLA routes the inter-slice hop over DCN
automatically — keep the mesh's ``data`` axis ordered so that
majority-of-reduction neighbors are intra-slice (the default
``jax.devices()`` order already is).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from .mesh import batch_sharding


def host_shard() -> tuple:
    """``(process_index, process_count)`` of this host."""
    return jax.process_index(), jax.process_count()


def local_merge(global_merge: int) -> int:
    """Sampler pairs this host decodes per global batch."""
    pc = jax.process_count()
    if global_merge % pc != 0:
        raise ValueError(
            f"global merge {global_merge} not divisible by "
            f"process_count {pc}")
    return global_merge // pc


def make_global_batch(local_batch: Dict, mesh) -> Dict:
    """Per-host local batch -> global batch-sharded ``jax.Array`` dict.

    ``local_batch`` holds this host's rows of the global batch (u8 image
    / label arrays from the host pipeline).  The returned arrays are
    globally addressable with the leading axis sharded over the mesh's
    ``data`` axis; non-array entries (``case_name``) stay host-local.
    """
    sh = batch_sharding(mesh)
    pc = jax.process_count()
    out: Dict = {}
    for key, val in local_batch.items():
        if not isinstance(val, np.ndarray):
            out[key] = val
            continue
        global_shape = (val.shape[0] * pc,) + val.shape[1:]
        out[key] = jax.make_array_from_process_local_data(
            sh, val, global_shape)
    return out
