"""Cross-lower every Pallas kernel for TPU *locally* (no relay).

``jax.jit(f).trace(...).lower(lowering_platforms=('tpu',))`` runs the
full Pallas→Mosaic-MLIR lowering on any host, so block-spec violations
(sublane/lane divisibility, unsupported ref ranks) surface here in
seconds instead of costing a relay compile round-trip.  What it cannot
catch: crashes inside the Mosaic binary compiler itself (those happen on
the relay's tpu_compile_helper) — but in the r4 triage every failure so
far was either a lowering ValueError or plausibly rank/layout-induced,
so this is the cheap first gate.

Usage: python tools/lowering_triage.py [--only patch|attn]
Exit code = number of failing cases.
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from semantic_segmentation_of_stylegan2_artifacts_tpu.ops import (  # noqa: E402
    fused_patch as fp,
    fused_window_attention as fa,
)

BF16 = jnp.bfloat16


def _lower(name, f, *args):
    try:
        jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))
        print(f"OK   {name}")
        return 0
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:240]
        print(f"FAIL {name}: {msg}")
        return 1


def _rng(*shape, dtype=BF16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype
    )


def patch_cases():
    for (b, h, w, c) in [(2, 128, 128, 128), (2, 64, 64, 256),
                         (2, 32, 32, 512)]:
        x = _rng(b, h, w, c)
        p = (jnp.ones((4 * c,), jnp.float32),
             jnp.zeros((4 * c,), jnp.float32), _rng(4 * c, 2 * c))

        def f(x, p):
            def loss(x, p):
                return jnp.sum(fp.fused_patch_merge(x, *p)
                               .astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1))(x, p)

        yield f"merge {b}x{h}x{w}x{c}", f, (x, p)

    for (b, h, w, c) in [(2, 16, 16, 1024), (2, 32, 32, 512),
                         (2, 64, 64, 256)]:
        x = _rng(b, h, w, c)
        p = (_rng(c, 2 * c), jnp.ones((c // 2,), jnp.float32),
             jnp.zeros((c // 2,), jnp.float32))

        def f(x, p):
            def loss(x, p):
                return jnp.sum(fp.fused_patch_expand(x, *p)
                               .astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1))(x, p)

        yield f"expand {b}x{h}x{w}x{c}", f, (x, p)


def attn_cases():
    for (b, h, w, c, nh, sh) in [(2, 128, 128, 128, 4, 3),
                                 (2, 16, 16, 1024, 32, 0)]:
        wh = ww = 7
        n_rel = (2 * wh - 1) * (2 * ww - 1)
        x = _rng(b, h, w, c)
        p = (_rng(c, 3 * c), jnp.zeros((3 * c,), BF16), _rng(c, c),
             jnp.zeros((c,), BF16), _rng(n_rel, nh, dtype=jnp.float32))

        def f(x, p, sh=sh, nh=nh):
            def loss(x, p):
                out = fa.fused_shifted_window_attention(
                    x, p[0], p[1], p[2], p[3], p[4],
                    window_size=(7, 7), shift_size=(sh, sh), num_heads=nh)
                return jnp.sum(out.astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1))(x, p)

        yield f"attn {b}x{h}x{w}x{c} h{nh} s{sh}", f, (x, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    a = ap.parse_args()
    # INTERPRET must stay False: interpret-mode pallas_calls skip the
    # Mosaic lowering this tool exists to exercise.
    gens = {"patch": patch_cases, "attn": attn_cases}
    fails = 0
    for key, gen in gens.items():
        if a.only and key != a.only:
            continue
        for name, f, args in gen():
            fails += _lower(name, f, *args)
    print(f"failures: {fails}")
    return fails


if __name__ == "__main__":
    sys.exit(main())
