"""End-to-end epoch throughput: host pipeline + device train step.

Measures what the reference's hot loop measures (reference
``trainer.py:295-336``) but wall-to-wall: PNG decode (native C++ path
when available) -> augmentation -> batch assembly -> H2D (uint8) ->
jitted train step, overlapped by the threaded prefetch loader.  Prints
one JSON line with images/sec and the ratio to the compute-only step
rate, so pipeline stalls are visible as ``host_efficiency < 1``.

Usage::

    python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.epoch_bench \
        [--img 512] [--n_fake 96] [--n_real 64] [--merge 4] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ..utils.platform import apply_platform_override

    apply_platform_override()  # honor SSA_TPU_PLATFORM like the CLIs
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--n_fake", type=int, default=96)
    ap.add_argument("--n_real", type=int, default=64)
    ap.add_argument("--merge", type=int, default=4,
                    help="sampler pairs per device batch (batch = 2*merge)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2,
                    help="epoch 1 warms compile; later epochs are timed")
    ap.add_argument("--data_dir", default="",
                    help="existing synthetic root (default: generate)")
    args = ap.parse_args()

    from ..core.config import default_config
    from ..data.dataset import SegArtifactDataset
    from ..data.pipeline import TrainLoader
    from ..data.synthetic import generate_synthetic_dataset
    from ..models import MSUNet
    from ..train import create_train_state
    from ..train.state import make_train_step
    from .. import native

    root = args.data_dir
    if not root:
        root = tempfile.mkdtemp(prefix="epoch_bench_")
        t0 = time.time()
        generate_synthetic_dataset(root, img_size=args.img,
                                   n_fake_train=args.n_fake,
                                   n_real_train=args.n_real)
        print(f"synthetic dataset ({args.n_fake}f+{args.n_real}r @ "
              f"{args.img}^2): {time.time()-t0:.1f}s", file=sys.stderr)

    lists = f"{root}/lists"
    fake = SegArtifactDataset(root, lists, "fake_train")
    real = SegArtifactDataset(root, lists, "real_train_all")
    loader = TrainLoader(fake, real, img_size=args.img, seed=0,
                         num_workers=args.workers)
    print(f"native decode: {native.available()}", file=sys.stderr)

    from ..models.msunet import _pallas_stages

    model = MSUNet(img_size=args.img, embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), window_size=7,
                   dtype=jnp.bfloat16, softmax_dtype=jnp.bfloat16,
                   gelu_tanh=True, fused_head=True,
                   use_pallas=_pallas_stages(True, args.img, patch=4,
                                             n_stages=4, window=7))
    config = default_config()
    config.defrost()
    config.DATA.IMG_SIZE = args.img
    config.MODEL.FREEZE_ENCODER = False
    config.freeze()
    t0 = time.time()
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        jnp.zeros((1, args.img, args.img, 3), jnp.bfloat16))
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=True)
    lr = jnp.asarray(1e-4, jnp.float32)

    batch_size = 2 * args.merge
    compute_dt = None
    epoch_rate = None
    for epoch in range(args.epochs):
        t0 = time.time()
        n_img = 0
        loss = None
        for batch in loader.epoch_batches_merged(epoch, args.merge):
            state, loss = step(state, jnp.asarray(batch["image"]),
                               jnp.asarray(batch["label"]), lr)
            n_img += batch["image"].shape[0]
        final = float(loss)  # hard host sync
        dt = time.time() - t0
        label = "warmup+compile" if epoch == 0 else "timed"
        print(f"epoch {epoch} ({label}): {n_img} imgs in {dt:.1f}s = "
              f"{n_img/dt:.2f} img/s (loss {final:.4f})", file=sys.stderr)
        if epoch > 0:
            epoch_rate = n_img / dt

    # compute-only rate on a resident batch, same step
    img_dev = jnp.asarray(np.zeros((batch_size, args.img, args.img, 3),
                                   np.uint8))
    lbl_dev = jnp.asarray(np.zeros((batch_size, args.img, args.img),
                                   np.uint8))
    for _ in range(3):
        state, loss = step(state, img_dev, lbl_dev, lr)
    float(loss)
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        state, loss = step(state, img_dev, lbl_dev, lr)
    float(loss)
    compute_dt = (time.time() - t0) / iters
    compute_rate = batch_size / compute_dt

    print(json.dumps({
        "metric": f"epoch_e2e_{args.img}sq_throughput",
        "value": round(epoch_rate, 3),
        "unit": "images/sec",
        "compute_only": round(compute_rate, 3),
        "host_efficiency": round(epoch_rate / compute_rate, 3),
        "native_decode": native.available(),
        "batch": batch_size,
    }))


if __name__ == "__main__":
    main()
