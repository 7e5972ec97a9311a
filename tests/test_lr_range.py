"""LR-range test capability."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
    default_config,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
    create_train_state,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.lr_range import (
    lr_range_test,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
    make_train_step,
)


def test_lr_range_sweep(tmp_path):
    model = MSUNet(img_size=32, embed_dim=8, depths=(1, 1, 1, 1),
                   num_heads=(1, 1, 1, 1), window_size=4)
    c = default_config(); c.defrost(); c.DATA.IMG_SIZE = 32
    state = create_train_state(model, c, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(0)
    batches = [
        {"image": rng.randint(0, 255, (2, 32, 32, 3), np.uint8),
         "label": (rng.rand(2, 32, 32) > 0.8).astype(np.uint8)}
        for _ in range(4)
    ]
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    out = str(tmp_path)
    lrs, losses = lr_range_test(state, step, batches, out,
                                min_lr=1e-6, max_lr=1e-3, n_steps=10,
                                plot=True)
    assert len(lrs) == 10
    assert abs(lrs[0] - 1e-6) < 1e-12
    assert abs(lrs[-1] - 1e-3) < 1e-9
    assert all(b > a for a, b in zip(lrs, lrs[1:]))  # monotone sweep
    assert all(np.isfinite(losses))
    with open(os.path.join(out, "lr_range_test.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["step", "lr", "train_loss", "val_loss"]
    assert len(rows) == 11
    assert os.path.exists(os.path.join(out, "weight_decay_test.png"))
