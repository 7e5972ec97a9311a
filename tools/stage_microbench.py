"""Per-stage Swin-block microbench: attention kernel vs pure XLA.

Times fwd+bwd of a block chain shaped like one MS-UNet stage (dim/heads/
depth/grid from flags) under each kernel configuration, net of the
dispatch floor. Used to locate step cost by sublayer and to A/B new
kernels at op level before in-step benches (BASELINE.md r3 breakdown:
stage 2 — 32² grid, c512, 18 blocks — was the top 512² step item).

Run from the repo root:
    python tools/stage_microbench.py --dim 512 --heads 16 --depth 18 \
        --grid 32 --batch 8
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import flax.linen as nn  # noqa: E402

from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers import (  # noqa: E402,E501
    Mlp,
    SwinBlock,
    WindowAttention,
    layer_norm,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.platform import (  # noqa: E402,E501
    apply_platform_override,
)


class FullStage(nn.Module):
    dim: int
    heads: int
    depth: int
    window: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = SwinBlock(
                dim=self.dim, num_heads=self.heads, window_size=self.window,
                shift=bool(i % 2), use_pallas=self.use_pallas,
                gelu_tanh=True, softmax_dtype=jnp.bfloat16,
                dtype=jnp.bfloat16, name=f"blk_{i}")(x, True)
        return x


class AttnOnly(nn.Module):
    dim: int
    heads: int
    depth: int
    window: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            s = self.window // 2 if (i % 2) else 0
            norm = layer_norm(f"norm_{i}", jnp.bfloat16)
            attn = WindowAttention(
                dim=self.dim, num_heads=self.heads,
                window_size=(self.window, self.window), shift_size=(s, s),
                use_pallas=self.use_pallas, softmax_dtype=jnp.bfloat16,
                dtype=jnp.bfloat16, name=f"attn_{i}")
            x = x + attn(norm(x), deterministic=True)
        return x


class MlpOnly(nn.Module):
    dim: int
    depth: int

    @nn.compact
    def __call__(self, x):
        from semantic_segmentation_of_stylegan2_artifacts_tpu.models.layers \
            import LayerNormParams

        for i in range(self.depth):
            norm = LayerNormParams(self.dim, dtype=jnp.bfloat16,
                                   name=f"norm_{i}")
            mlp = Mlp(hidden_dim=4 * self.dim, out_dim=self.dim,
                      gelu_tanh=True, dtype=jnp.bfloat16, name=f"mlp_{i}")
            y = mlp(norm(x), deterministic=True)
            x = x + y
        return x


def _timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3


def main():
    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--window", type=int, default=7)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sublayers", action="store_true",
                    help="also time attention-only / MLP-only chains")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.grid, args.grid, args.dim)
                    .astype(np.float32) * 0.1, jnp.bfloat16)

    floor = _timeit(jax.jit(lambda t: t * 1.000001), x, iters=args.iters)
    print(f"dispatch floor: {floor:.3f} ms", flush=True)

    def report(name, mod, xx):
        # One config failing to compile (e.g. a kernel body over the
        # helper's memory cap) must not kill the remaining A/B legs —
        # the r4 05:0x triage lost the whole dim-512 per-op comparison
        # to the block leg's VMEM OOM.
        try:
            variables = jax.jit(mod.init)(jax.random.PRNGKey(0), xx[:1])
            p = variables["params"]

            def loss(pp, xi):
                out = mod.apply({"params": pp}, xi)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            f = jax.jit(jax.value_and_grad(loss))
            t = _timeit(f, p, xx, iters=args.iters)
            print(f"{name:34s}: {t:8.3f} ms (-floor {t - floor:8.3f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            msg = str(e).replace("\n", " ")[:200]
            print(f"{name:34s}: FAILED ({type(e).__name__}: {msg})",
                  flush=True)

    shape = dict(dim=args.dim, heads=args.heads, depth=args.depth,
                 window=args.window)
    report("stage: attn kernel only",
           FullStage(use_pallas=True, **shape), x)
    report("stage: pure XLA", FullStage(**shape), x)
    if args.sublayers:
        sub = dict(dim=args.dim, heads=args.heads, depth=args.depth,
                   window=args.window)
        report("attn sublayers (kernel)",
               AttnOnly(use_pallas=True, **sub), x)
        report("attn sublayers (xla)", AttnOnly(**sub), x)
        report("mlp sublayers (xla)",
               MlpOnly(dim=args.dim, depth=args.depth), x)


if __name__ == "__main__":
    main()
