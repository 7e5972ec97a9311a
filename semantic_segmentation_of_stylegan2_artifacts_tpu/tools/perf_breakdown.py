"""Per-section timing of the MS-UNet on the current backend.

The relay TPU backend degrades ``jax.profiler`` traces to no-ops
(docs/ROADMAP.md P3.12), so op-level attribution is done empirically:
each model section is jitted separately, timed with a hard host sync
(value fetch — ``block_until_ready`` is unreliable over the relay,
CLAUDE.md), and the measured dispatch floor is subtracted.  This is the
tool that produced the round-2 stage map in BASELINE.md (encoder-stage
costs, the up_x4 head hotspot, the erf-GELU tax).

Usage::

    python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.perf_breakdown \
        [--img 512] [--batch 8] [--bwd]

``--bwd`` times fwd+bwd per section (value_and_grad of a sum) instead
of forward only.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    from ..utils.platform import apply_platform_override

    apply_platform_override()  # honor SSA_TPU_PLATFORM like the CLIs
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bwd", action="store_true",
                    help="time fwd+bwd per section instead of forward only")
    ap.add_argument("--gelu_exact", action="store_true")
    ap.add_argument("--pallas_attn", action="store_true")
    args = ap.parse_args()

    from ..models import MSUNet

    model = MSUNet(
        img_size=args.img, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=7, dtype=jnp.bfloat16,
        softmax_dtype=jnp.bfloat16, gelu_tanh=not args.gelu_exact,
        use_pallas=args.pallas_attn, fused_head=not args.gelu_exact,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.img, args.img, 3)
                    .astype(np.float32), jnp.bfloat16)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, True)
    )(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]

    def wrap(fn):
        if not args.bwd:
            return jax.jit(fn)

        def loss(p, *rest):
            out = fn(p, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)

        return jax.jit(jax.value_and_grad(loss))

    floor = _timeit(jax.jit(lambda t: t * 1.000001), x, iters=args.iters)
    mode = "fwd+bwd" if args.bwd else "fwd"
    print(f"dispatch floor: {floor:.3f} ms ({mode} per section)", flush=True)

    def report(name, fn, *a):
        t = _timeit(wrap(fn), *a, iters=args.iters)
        print(f"{name:24s}: {t:8.3f} ms (-floor {t - floor:8.3f})",
              flush=True)

    def full(p, xx):
        return model.apply({"params": p}, xx, True)

    def fwd_features(p, xx):
        def m(mdl, xi):
            return mdl.msunet.forward_features(xi, True)
        return model.apply({"params": p}, xx, method=m)

    def fwd_up(p, feats):
        xx, skips = feats
        def m(mdl, xi, sk):
            return mdl.msunet.forward_up_features(xi, list(sk), True)
        return model.apply({"params": p}, xx, skips, method=m)

    def fwd_head(p, xup):
        def m(mdl, xi):
            return mdl.msunet.up_x4(xi)
        return model.apply({"params": p}, xup, method=m)

    report("full forward", full, params, x)
    report("encoder+cents", fwd_features, params, x)
    feats = jax.jit(fwd_features)(params, x)
    report("main decoder", fwd_up, params, feats)
    xup = jax.jit(fwd_up)(params, feats)
    report("up_x4 head", fwd_head, params, xup)

    grids = [args.img // 4 // (2 ** i) for i in range(4)]
    dims = [128 * 2 ** i for i in range(4)]
    for i in range(4):
        g, cdim = grids[i], dims[i]
        xi = jnp.asarray(
            rng.randn(args.batch, g, g, cdim).astype(np.float32) * 0.1,
            jnp.bfloat16)

        def stage(p, xin, _i=i):
            def m(mdl, xx):
                return mdl.msunet.layers[_i](xx, True)
            return model.apply({"params": p}, xin, method=m)

        report(f"enc stage {i} ({g}^2,c{cdim})", stage, params, xi)


if __name__ == "__main__":
    main()
