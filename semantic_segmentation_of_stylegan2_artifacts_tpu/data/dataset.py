"""Dataset sources: split lists + real/fake directory resolution.

Mirrors the reference's ``dataset/dataset.py`` contract:

* a split file ``<list_dir>/<split>.txt`` of basenames, one per line,
* each basename resolves to ``real_images/<id>.png`` or
  ``fake_images/<id>.png`` with matching ``{real,fake}_labels/<id>_mask.png``
  (missing files raise), loaded as RGB / L,
* returned samples carry ``image`` (H,W,3 uint8), ``label`` (H,W uint8)
  and ``case_name``.

The load-bearing naming convention is preserved: fake ids start with
"09" (reference ``lists/split_train_in_real_and_fake.py:18``).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
from PIL import Image

from .. import native


def load_rgb(path: str) -> np.ndarray:
    """(H, W, 3) uint8; native GIL-released decoder when available."""
    if native.available():
        try:
            return native.decode_image(path)
        except ValueError:
            pass  # unusual encoding: PIL handles the long tail
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def load_gray(path: str) -> np.ndarray:
    """(H, W) uint8 luma with PIL convert("L") rounding semantics."""
    if native.available():
        try:
            return native.decode_image(path, gray=True)
        except ValueError:
            pass
    return np.asarray(Image.open(path).convert("L"), dtype=np.uint8)


def read_split_list(list_dir: str, split: str) -> List[str]:
    path = os.path.join(list_dir, split + ".txt")
    with open(path, "r", encoding="utf-8") as f:
        return [ln.strip() for ln in f if ln.strip()]


def is_fake_id(case_name: str) -> bool:
    """Fake StyleGAN2 ids start with '09' (6-digit); real ids are 5-digit."""
    return case_name.startswith("09")


class SegArtifactDataset:
    """Images + masks for one split (map-style, host-side)."""

    def __init__(self, base_dir: str, list_dir: str, split: str,
                 transform=None):
        self.data_dir = base_dir
        self.split = split
        self.transform = transform
        self.sample_list = read_split_list(list_dir, split)

    def __len__(self) -> int:
        return len(self.sample_list)

    def _resolve(self, name: str):
        real_img = os.path.join(self.data_dir, "real_images", name + ".png")
        fake_img = os.path.join(self.data_dir, "fake_images", name + ".png")
        real_lbl = os.path.join(self.data_dir, "real_labels", name + "_mask.png")
        fake_lbl = os.path.join(self.data_dir, "fake_labels", name + "_mask.png")
        if os.path.exists(real_img):
            if not os.path.exists(real_lbl):
                raise FileNotFoundError(f"Label {name} not found in real_labels")
            return real_img, real_lbl
        if os.path.exists(fake_img):
            if not os.path.exists(fake_lbl):
                raise FileNotFoundError(f"Label {name} not found in fake_labels")
            return fake_img, fake_lbl
        raise FileNotFoundError(
            f"Sample {name} not found in real_images/ or fake_images/"
        )

    def __getitem__(self, idx: int) -> Dict:
        name = self.sample_list[idx]
        img_path, lbl_path = self._resolve(name)
        image = load_rgb(img_path)
        label = load_gray(lbl_path)
        sample = {"image": image, "label": label, "case_name": name}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SegArtifactNoLabelDataset:
    """Image-only variant for label-free inference
    (reference ``dataset/dataset.py:166-209``)."""

    def __init__(self, base_dir: str, list_dir: str, split: str,
                 transform=None):
        self.data_dir = base_dir
        self.split = split
        self.transform = transform
        self.sample_list = read_split_list(list_dir, split)

    def __len__(self) -> int:
        return len(self.sample_list)

    def __getitem__(self, idx: int) -> Dict:
        name = self.sample_list[idx]
        for sub in ("real_images", "fake_images"):
            p = os.path.join(self.data_dir, sub, name + ".png")
            if os.path.exists(p):
                image = load_rgb(p)
                sample = {"image": image, "case_name": name}
                if self.transform is not None:
                    sample = self.transform(sample)
                return sample
        raise FileNotFoundError(
            f"Sample {name} not found in real_images/ or fake_images/"
        )
