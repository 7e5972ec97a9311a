"""Op-level A/B of the fused PatchMerging/PatchExpand kernels vs XLA.

Times fwd and fwd+bwd of every merge/expand instance of the flagship
MS-UNet at a given image size (XLA path vs ``ops/fused_patch``), net of
the dispatch floor.  Doubles as the hardware compile triage for the
kernels (a Mosaic rejection surfaces here on one small op instead of
inside a 283 ms train-step compile).

Run from the repo root:
    python tools/patch_microbench.py --img 512 --batch 8
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (  # noqa: E402,E501
    PatchExpand,
    PatchMerging,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.platform import (  # noqa: E402,E501
    apply_platform_override,
)


def _timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3


def _bench_module(mod_cls, dim, fused, x, iters):
    mod = mod_cls(dim=dim, use_fused_patch=fused, dtype=jnp.bfloat16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    fwd = jax.jit(lambda p, v: mod.apply(p, v))

    def loss(p, v):
        return jnp.sum(mod.apply(p, v).astype(jnp.float32))

    step = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_f = _timeit(fwd, params, x, iters=iters)
    t_fb = _timeit(step, params, x, iters=iters)
    return t_f, t_fb


def main():
    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--embed", type=int, default=128)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    g0 = args.img // 4  # post-patch-embed grid

    floor = _timeit(jax.jit(lambda t: t * 1.000001),
                    jnp.ones((8, 128)), iters=args.iters)
    print(f"dispatch floor: {floor:.3f} ms", flush=True)

    # every distinct (grid, C) instance in the flagship model
    merges = [(g0 // 2 ** i, args.embed * 2 ** i) for i in range(3)]
    expands = [(g0 // 2 ** i, args.embed * 2 ** i) for i in (3, 2, 1)]

    for grid, c in merges:
        x = jnp.asarray(
            rng.randn(args.batch, grid, grid, c).astype(np.float32) * 0.1,
            jnp.bfloat16)
        row = {"op": "merge", "grid": grid, "c": c}
        for fused in (False, True):
            try:
                t_f, t_fb = _bench_module(PatchMerging, c, fused, x,
                                          args.iters)
                key = "kernel" if fused else "xla"
                row[f"{key}_fwd_ms"] = round(t_f - floor, 3)
                row[f"{key}_fb_ms"] = round(t_fb - floor, 3)
            except Exception as e:  # noqa: BLE001
                row["kernel_error" if fused else "xla_error"] = (
                    f"{type(e).__name__}: {str(e)[:200]}")
        print(row, flush=True)

    for grid, c in expands:
        x = jnp.asarray(
            rng.randn(args.batch, grid, grid, c).astype(np.float32) * 0.1,
            jnp.bfloat16)
        row = {"op": "expand", "grid": grid, "c": c}
        for fused in (False, True):
            try:
                t_f, t_fb = _bench_module(PatchExpand, c, fused, x,
                                          args.iters)
                key = "kernel" if fused else "xla"
                row[f"{key}_fwd_ms"] = round(t_f - floor, 3)
                row[f"{key}_fb_ms"] = round(t_fb - floor, 3)
            except Exception as e:  # noqa: BLE001
                row["kernel_error" if fused else "xla_error"] = (
                    f"{type(e).__name__}: {str(e)[:200]}")
        print(row, flush=True)


if __name__ == "__main__":
    main()
