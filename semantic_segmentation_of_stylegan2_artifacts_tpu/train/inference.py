"""Inference utilities: validation loss, label-free prediction, tiling.

* :func:`validation_loss` — mean DynamicLoss over (a prefix of) a val
  loader (reference ``scripts/validation_functions.py:8-34``),
* :func:`artifact_prediction` — label-free sweep returning
  ``(case_name, sigmoid map)`` pairs (reference ``:312-357``,
  sic "atrifact_prediction"),
* :func:`tiled_predict` — sliding-window inference for images larger than
  the model's native size (the TPU-native answer to 1024² full-res faces,
  BASELINE.md workload #4): overlapping tiles, Hann-weighted blending,
  all tiles batched through one jitted forward.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def validation_loss(eval_step: Callable, params, val_loader,
                    bool_break: bool = False, n_batches: int = 0) -> float:
    """Mean val loss over the loader (or its first ``n_batches``)."""
    losses: List[float] = []
    for i_batch, batch in enumerate(val_loader):
        if bool_break and i_batch >= n_batches:
            break
        _, loss = eval_step(params, jnp.asarray(batch["image"]),
                            jnp.asarray(batch["label"]))
        losses.append(float(loss))
    if not losses:
        return float("nan")
    return sum(losses) / len(losses)


def artifact_prediction(predict_step: Callable, params, loader
                        ) -> List[Tuple[str, np.ndarray]]:
    """Label-free inference over a loader of image-only batches."""
    out: List[Tuple[str, np.ndarray]] = []
    for batch in loader:
        probs = predict_step(params, jnp.asarray(batch["image"]))
        out.append((batch["case_name"][0], np.asarray(probs[0])))
    return out


def _hann2d(tile: int) -> np.ndarray:
    w = np.hanning(tile + 2)[1:-1]
    win = np.outer(w, w)
    return np.maximum(win, 1e-3).astype(np.float32)


def tile_grid(size: int, tile: int, stride: int) -> List[int]:
    """Tile start offsets covering [0, size) with the last tile flush."""
    if tile >= size:
        return [0]
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return starts


def tiled_predict(
    predict_step: Callable,
    params,
    image_u8: np.ndarray,
    tile: int,
    overlap: float = 0.5,
    batch_tiles: int = 8,
) -> np.ndarray:
    """Sliding-window probability map for one (H, W, 3) uint8 image.

    ``predict_step(params, (B, tile, tile, 3) u8) -> (B, tile, tile)``
    probabilities — or ``(B, tile, tile, C)`` per-class maps, which are
    blended channel-wise and returned as ``(H, W, C)``.  Overlapping
    predictions are blended with a 2-D Hann window, so seams vanish;
    tiles are batched to keep the MXU fed.
    """
    h, w, _ = image_u8.shape
    stride = max(1, int(tile * (1.0 - overlap)))
    ys = tile_grid(h, tile, stride)
    xs = tile_grid(w, tile, stride)

    coords = [(y, x) for y in ys for x in xs]
    win = _hann2d(tile)
    acc = None  # allocated once the channel count is known
    den = np.zeros((h, w), np.float64)

    for i in range(0, len(coords), batch_tiles):
        chunk = coords[i:i + batch_tiles]
        tiles = np.stack([image_u8[y:y + tile, x:x + tile] for y, x in chunk])
        if len(chunk) < batch_tiles:  # pad to a fixed batch (no recompiles)
            pad = np.zeros((batch_tiles - len(chunk), tile, tile, 3), np.uint8)
            tiles = np.concatenate([tiles, pad])
        probs = np.asarray(predict_step(params, jnp.asarray(tiles)))
        if acc is None:
            acc = np.zeros((h, w) + probs.shape[3:], np.float64)
        for (y, x), p in zip(chunk, probs):
            wv = win if p.ndim == 2 else win[:, :, None]
            acc[y:y + tile, x:x + tile] += p.astype(np.float64) * wv
            den[y:y + tile, x:x + tile] += win
    dv = den if acc.ndim == 2 else den[:, :, None]
    return (acc / np.maximum(dv, 1e-9)).astype(np.float32)
