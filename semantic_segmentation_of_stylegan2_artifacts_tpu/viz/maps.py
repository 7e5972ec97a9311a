"""Prediction visualization: heatmaps, binary masks, contour overlays.

Capability parity with reference ``scripts/map_generator.py``: per-case
grey heatmap + binary mask PNGs, a green->yellow->red color heatmap with
colorbar, probability contours, and a translucent-magenta contour overlay.
Inputs are numpy (H,W) probability maps in [0,1] and (H,W,3) uint8 images.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..data.dataset import is_fake_id


def _to_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(x, dtype=np.float32), 0.0, 1.0) * 255.0


def save_grey_heatmap(heat_hw: np.ndarray, out_png: str) -> None:
    Image.fromarray(_to_u8(heat_hw).astype(np.uint8), "L").save(out_png)


def save_binary_mask(heat_hw: np.ndarray, out_png: str,
                     threshold: float = 0.5) -> None:
    mask = (np.asarray(heat_hw) > threshold).astype(np.uint8) * 255
    Image.fromarray(mask, "L").save(out_png)


def _gyr_colormap(heat: np.ndarray) -> np.ndarray:
    """Green -> yellow -> red colormap, (H,W) in [0,1] -> (H,W,3) uint8."""
    h = np.clip(np.asarray(heat, np.float32), 0.0, 1.0)
    r = np.clip(2.0 * h, 0, 1)
    g = np.clip(2.0 * (1.0 - h), 0, 1)
    b = np.zeros_like(h)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def save_color_heatmap(img_hw3: np.ndarray, heat_hw: np.ndarray,
                       out_png: str, alpha: float = 0.45,
                       with_colorbar: bool = True) -> None:
    """Overlay a green/yellow/red heatmap on the image (+ colorbar).

    Reference: ``map_generator.py:23-65`` (matplotlib there; done with
    matplotlib here too when available, else pure-PIL fallback).
    """
    img = np.asarray(img_hw3, dtype=np.uint8)
    heat = np.clip(np.asarray(heat_hw, np.float32), 0, 1)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.colors import LinearSegmentedColormap

        cmap = LinearSegmentedColormap.from_list(
            "gyr", [(0, "green"), (0.5, "yellow"), (1, "red")]
        )
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(img)
        hm = ax.imshow(heat, cmap=cmap, alpha=alpha, vmin=0.0, vmax=1.0)
        if with_colorbar:
            fig.colorbar(hm, ax=ax, fraction=0.046, pad=0.04)
        ax.axis("off")
        fig.savefig(out_png, bbox_inches="tight", dpi=150)
        plt.close(fig)
    except Exception:
        overlay = _gyr_colormap(heat)
        blend = (img.astype(np.float32) * (1 - alpha)
                 + overlay.astype(np.float32) * alpha)
        Image.fromarray(blend.astype(np.uint8), "RGB").save(out_png)


def save_contour_heatmap(img_hw3: np.ndarray, heat_hw: np.ndarray,
                         out_png: str,
                         levels: Sequence[float] = (0.3, 0.6, 0.9)) -> None:
    """Probability contour plot at fixed levels
    (reference ``map_generator.py:67-106``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(np.asarray(img_hw3, dtype=np.uint8))
    cs = ax.contour(np.clip(np.asarray(heat_hw, np.float32), 0, 1),
                    levels=list(levels), colors=["green", "yellow", "red"])
    ax.clabel(cs, inline=True, fontsize=6)
    ax.axis("off")
    fig.savefig(out_png, bbox_inches="tight", dpi=150)
    plt.close(fig)


def overlay_mask_on_image(img_hw3: np.ndarray, mask_hw: np.ndarray,
                          out_png: Optional[str] = None,
                          color: Tuple[int, int, int] = (255, 0, 255),
                          fill_alpha: float = 0.3) -> np.ndarray:
    """Magenta contours + translucent fill over the binary mask
    (reference ``map_generator.py:108-145``)."""
    import cv2

    img = np.asarray(img_hw3, dtype=np.uint8).copy()
    mask = (np.asarray(mask_hw) > 0).astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    fill = img.copy()
    fill[mask > 0] = color
    img = cv2.addWeighted(fill, fill_alpha, img, 1 - fill_alpha, 0)
    cv2.drawContours(img, contours, -1, color, 2)
    if out_png:
        Image.fromarray(img, "RGB").save(out_png)
    return img


# distinct mid-saturation colors for class ids 1..12 (0 = background stays
# black); multi-class artifact segmentation is an extension beyond the
# binary reference task (BASELINE.json workload #5)
_CLASS_PALETTE = np.array(
    [(0, 0, 0), (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
     (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
     (210, 245, 60), (250, 190, 212), (0, 128, 128), (220, 190, 255)],
    dtype=np.uint8,
)


def save_class_map(probs_hwc: np.ndarray, out_png: str,
                   bg_threshold: float = 0.5) -> np.ndarray:
    """Color PNG of the argmax class per pixel from per-class sigmoids.

    Channel ``c`` holds class id ``c`` (0 = background).  A pixel whose
    winning probability is below ``bg_threshold`` is painted background —
    per-class sigmoids are multi-label, so low-confidence argmax pixels
    are not artifact claims.
    """
    p = np.asarray(probs_hwc, np.float32)
    cls = p.argmax(axis=-1)
    cls = np.where(p.max(axis=-1) >= bg_threshold, cls, 0)
    rgb = _CLASS_PALETTE[np.minimum(cls, len(_CLASS_PALETTE) - 1)]
    if out_png:
        Image.fromarray(rgb, "RGB").save(out_png)
    return rgb


def export_class_maps(
    output_saver: Iterable[Tuple[str, np.ndarray]],
    pred_dir: str,
    bg_threshold: float = 0.5,
) -> List[str]:
    """Write ``{case}_class_map.png`` for each (case, (H, W, C)) entry."""
    os.makedirs(pred_dir, exist_ok=True)
    written: List[str] = []
    for case_name, probs in output_saver:
        out = os.path.join(pred_dir, f"{case_name}_class_map.png")
        save_class_map(np.asarray(probs), out, bg_threshold)
        written.append(out)
    return written


def create_bin_heat_mask_from_list(
    output_saver: Iterable[Tuple[str, np.ndarray]],
    pred_dir: str,
    dataset_root: str,
    threshold: float = 0.5,
    include_original: bool = False,
) -> List[str]:
    """Per-case export: grey heat, binary mask, color heatmap, overlay.

    Routes to ``fake_images/``/``real_images/`` by the "09" id prefix.
    Two naming contracts, both from the reference:

    * trainer-side (``include_original=False``, reference
      ``trainer.py:458-491``): grey heat + bin mask (threshold 0.5) +
      color heatmap as ``{case}_overlay_color.png`` (the contour overlay
      written as ``{case}_overlay_contour.png`` is an addition here);
    * test-side (``include_original=True``, reference ``test.py:183-224``):
      additionally copies the original image to ``{case}.png``, names the
      color heatmap ``{case}_heatmap.png`` and the magenta contour
      overlay ``{case}_overlay_color.png`` (threshold 0.4 there).
    """
    os.makedirs(pred_dir, exist_ok=True)
    written: List[str] = []
    for case_name, pred in output_saver:
        case_name = str(case_name)
        heat = np.clip(np.asarray(pred, np.float32), 0.0, 1.0)
        if heat.ndim == 3:
            heat = heat[0]
        sub = "fake_images" if is_fake_id(case_name) else "real_images"
        img_path = os.path.join(dataset_root, sub, case_name + ".png")
        if not os.path.exists(img_path):
            raise FileNotFoundError(f"Image not found: {img_path}")
        image = np.asarray(Image.open(img_path).convert("RGB"), dtype=np.uint8)

        grey = os.path.join(pred_dir, f"{case_name}_grey_heats.png")
        save_grey_heatmap(heat, grey)
        binp = os.path.join(pred_dir, f"{case_name}_bin_mask.png")
        save_binary_mask(heat, binp, threshold)
        written += [grey, binp]
        if include_original:
            orig = os.path.join(pred_dir, f"{case_name}.png")
            Image.fromarray(image, "RGB").save(orig)
            colp = os.path.join(pred_dir, f"{case_name}_heatmap.png")
            ovp = os.path.join(pred_dir, f"{case_name}_overlay_color.png")
            written.append(orig)
        else:
            colp = os.path.join(pred_dir, f"{case_name}_overlay_color.png")
            ovp = os.path.join(pred_dir, f"{case_name}_overlay_contour.png")
        save_color_heatmap(image, heat, colp, alpha=0.45)
        overlay_mask_on_image(image, heat > threshold, ovp)
        written += [colp, ovp]
    return written
