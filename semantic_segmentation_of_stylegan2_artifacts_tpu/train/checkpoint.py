"""Checkpointing: atomic best-model save + full resume state.

The reference saves ``{'model': state_dict, 'epoch', 'best_score'}`` via a
tmp-file + ``os.replace`` dance (reference ``trainer.py:361-385``) and has
no resume path.  Here both are first-class:

* :func:`save_checkpoint` — msgpack (flax.serialization) of an arbitrary
  pytree, written atomically (tmp -> ``os.replace``),
* :func:`restore_checkpoint` — load into a target pytree (shape-checked by
  flax) or raw,
* best/last conveniences mirroring the reference's file names
  (``best_model`` / ``epoch_N``), with a ``.msgpack`` extension.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomically serialize a pytree to ``path`` (msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_best(log_dir: str, params: Any, epoch: int, best_score: float) -> str:
    """Best-Score checkpoint (reference payload shape, trainer.py:372-374)."""
    path = os.path.join(log_dir, "best_model.msgpack")
    save_checkpoint(path, {"model": params, "epoch": epoch,
                           "best_score": best_score})
    return path


def load_best(path_or_dir: str, params_target: Optional[Any] = None) -> Dict:
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "best_model.msgpack")
    raw = restore_checkpoint(path)
    if params_target is not None:
        raw["model"] = serialization.from_state_dict(params_target, raw["model"])
    return raw


def save_last(log_dir: str, epoch: int, params: Any, opt_state: Any,
              iter_num: int, dice: float) -> str:
    """Last-epoch checkpoint incl. optimizer (trainer.py:403-409 payload)."""
    path = os.path.join(log_dir, f"epoch_{epoch}.msgpack")
    save_checkpoint(path, {
        "epoch": epoch,
        "model": params,
        "optimizer": jax.tree.map(lambda x: x, opt_state),
        "iter_num": iter_num,
        "dice": dice,
    })
    return path


# ---------------------------------------------------------------------------
# Orbax backend (optional): async-capable, sharding-aware checkpoints
# ---------------------------------------------------------------------------
def save_checkpoint_orbax(path: str, tree: Any) -> None:
    """Save via orbax StandardCheckpointer (directory-based, atomic).

    Preferred for large/sharded states (multi-host, async); the msgpack
    backend remains the default for single-file portability.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree))
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            target,
        )
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))
