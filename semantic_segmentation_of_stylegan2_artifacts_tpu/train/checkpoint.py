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
import queue
import threading
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


def read_checkpoint_auto(path: str) -> Any:
    """Raw state-dict from either backend: msgpack file or orbax dir."""
    if os.path.isdir(path):
        return restore_checkpoint_orbax(path)
    return restore_checkpoint(path)


def load_best(path_or_dir: str, params_target: Optional[Any] = None) -> Dict:
    path = path_or_dir
    if os.path.isdir(path):
        mp = os.path.join(path, "best_model.msgpack")
        ob = os.path.join(path, "best_model.orbax")
        if os.path.exists(mp):
            path = mp
        elif os.path.isdir(ob):
            path = ob
        elif not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
            # not an orbax checkpoint directory itself either
            raise FileNotFoundError(f"No best_model checkpoint in {path}")
    raw = read_checkpoint_auto(path)
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


class CheckpointWriter:
    """Best/last checkpoint writer with a selectable backend + async mode.

    ``backend``:

    * ``msgpack`` — single-file ``flax.serialization`` (default; portable,
      what the reference's ``torch.save`` tmp+replace dance maps to,
      reference ``trainer.py:361-385``),
    * ``orbax`` — directory-based orbax checkpoints (``best_model.orbax``
      / ``epoch_N.orbax``): sharding-aware (multi-host/sharded
      ``jax.Array`` leaves are written per-shard, no host gather) and
      async-capable.

    ``async_=True`` hands the live device arrays to a background writer
    thread, so the device→host transfer + serialization overlap the next
    epoch's compute — safe because ``jax.Array``s are immutable, so the
    snapshot is consistent no matter when the thread drains it.  Saves
    are applied strictly in submission order (one worker); call
    :meth:`wait` (or :meth:`close`) before reading the files.  A failed
    background save re-raises from the next ``wait()``.
    """

    def __init__(self, backend: str = "msgpack", async_: bool = False):
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint backend: {backend!r}")
        self.backend = backend
        self.async_ = bool(async_)
        self._error: Optional[BaseException] = None
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        if self.async_:
            self._queue = queue.Queue()
            self._thread = threading.Thread(
                target=self._drain, name="ckpt-writer", daemon=True)
            self._thread.start()

    # ---- public API ------------------------------------------------------
    def save_best(self, log_dir: str, params: Any, epoch: int,
                  best_score: float) -> str:
        path = os.path.join(log_dir, "best_model." + self._ext)
        self._submit(path, {"model": params, "epoch": int(epoch),
                            "best_score": float(best_score)})
        return path

    def save_last(self, log_dir: str, epoch: int, params: Any,
                  opt_state: Any, iter_num: int, dice: float) -> str:
        path = os.path.join(log_dir, f"epoch_{epoch}." + self._ext)
        self._submit(path, {"epoch": int(epoch), "model": params,
                            "optimizer": opt_state,
                            "iter_num": int(iter_num), "dice": float(dice)})
        return path

    def wait(self) -> None:
        """Block until all submitted saves are durable; re-raise failures."""
        if self._queue is not None:
            self._queue.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def close(self) -> None:
        self.wait()
        if self._thread is not None:
            self._queue.put(None)
            self._thread.join(timeout=30)
            self._thread = None

    # ---- internals ---------------------------------------------------------
    @property
    def _ext(self) -> str:
        return "msgpack" if self.backend == "msgpack" else "orbax"

    def _submit(self, path: str, tree: Any) -> None:
        if not self.async_:
            self._write(path, tree)
            return
        if self._error is not None:  # surface earlier failure promptly
            self.wait()
        # Snapshot to host BEFORE enqueueing: the train step donates the
        # state buffers (state.py donate_argnums), so the device arrays
        # handed to us are deleted the moment the next step dispatches.
        # copy_to_host_async launches all D2H transfers in parallel;
        # device_get then just joins them — the caller blocks only for
        # the transfer, while serialization + disk IO stay on the worker.
        jax.tree.map(
            lambda x: x.copy_to_host_async()
            if hasattr(x, "copy_to_host_async") else None, tree)
        self._queue.put((path, jax.device_get(tree)))

    def _write(self, path: str, tree: Any) -> None:
        if self.backend == "msgpack":
            save_checkpoint(path, tree)
            return
        import orbax.checkpoint as ocp

        # state-dict form: orbax's Standard handler wants dict/array
        # pytrees — optax namedtuples / masked nodes flatten the same way
        # the msgpack backend flattens them
        tree = serialization.to_state_dict(tree)
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        try:
            ckptr.save(os.path.abspath(path),
                       args=ocp.args.StandardSave(tree), force=True)
            ckptr.wait_until_finished()
        finally:
            ckptr.close()

    def _drain(self) -> None:
        while True:
            job = self._queue.get()
            try:
                if job is None:
                    return
                self._write(*job)
            except BaseException as e:  # noqa: BLE001 — surfaced via wait()
                self._error = e
            finally:
                self._queue.task_done()
