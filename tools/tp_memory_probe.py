"""Measure tensor parallelism's activation-memory headroom (compile-only).

``parallel/tp.py`` claims TP "mainly buys activation-memory headroom at
1024²".  Only one real TPU chip is reachable here, so the claim is
substantiated the compile-only way: AOT-lower the FULL train step (fwd +
DynamicLoss + bwd + AdamW) on a virtual CPU mesh with abstract inputs
(``ShapeDtypeStruct`` carrying shardings — no multi-GB buffers are ever
allocated) and read XLA's ``CompiledMemoryStats`` for

* ``replicated``  — params replicated on a 1-device mesh (the single-chip
  deployment layout that OOMs at 1024² batch 4, BASELINE.md), and
* ``tp=N``        — the Megatron placements of ``parallel/tp.py`` over an
  N-way ``model`` axis (Pallas kernels gated off via ``model_axis``, the
  same routing a real TP run uses).

``temp_size_in_bytes`` is the activation/workspace arena of ONE device's
SPMD module — the number the headroom claim is about; argument bytes
show the param-shard savings.  The partitioner's layout decisions are
backend-specific, so treat the CPU numbers as structural (what GSPMD
shards), not as exact v5e HBM bytes.

Usage (from the repo root):
    SSA_TPU_PLATFORM=cpu python tools/tp_memory_probe.py --img 1024 --batch 4
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.platform import (
    apply_platform_override,
)

apply_platform_override()


def _abstract_state(model, config, img_size):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
        create_train_state,
    )

    return jax.eval_shape(
        lambda: create_train_state(
            model, config, jax.random.PRNGKey(0),
            jnp.zeros((1, img_size, img_size, 3), model.dtype),
        )
    )


def _with_shardings(tree, mesh, spec_fn):
    """ShapeDtypeStruct tree with a NamedSharding per array leaf.

    Walks with ``tree_map_with_path`` so flax struct dataclasses
    (TrainState) and optax namedtuples are traversed too — a hand-rolled
    dict walk silently skips them and leaves the whole state unsharded.
    """
    from jax.sharding import NamedSharding
    from jax.tree_util import (
        DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey,
        tree_map_with_path,
    )

    def key_str(k):
        if isinstance(k, DictKey):
            return str(k.key)
        if isinstance(k, GetAttrKey):
            return k.name
        if isinstance(k, SequenceKey):
            return str(k.idx)
        if isinstance(k, FlattenedIndexKey):
            return str(k.key)
        return str(k)

    def leaf(path, node):
        if hasattr(node, "shape") and hasattr(node, "dtype"):
            names = tuple(key_str(k) for k in path)
            return jax.ShapeDtypeStruct(
                node.shape, node.dtype,
                sharding=NamedSharding(mesh, spec_fn(names, node)))
        return node

    return tree_map_with_path(leaf, tree)


def _probe(model, config, img_size, batch, mesh, spec_fn, label):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
        make_train_step,
    )

    state = _with_shardings(
        _abstract_state(model, config, img_size), mesh, spec_fn)
    rep = NamedSharding(mesh, P())
    img = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8,
                               sharding=rep)
    lbl = jax.ShapeDtypeStruct((batch, img_size, img_size), jnp.uint8,
                               sharding=rep)
    lr = jax.ShapeDtypeStruct((), jnp.float32, sharding=rep)
    step = make_train_step(model, 0.2, 0.8, 0.45, donate=False)
    compiled = step.lower(state, img, lbl, lr).compile()
    ma = compiled.memory_analysis()
    row = {
        "layout": label,
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    args = ap.parse_args()

    from jax.sharding import PartitionSpec as P

    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.parallel import (
        make_mesh,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.parallel.tp import (
        _tp_spec,
    )

    if len(jax.devices()) < args.tp:
        print(f"need {args.tp} devices (set XLA_FLAGS="
              f"--xla_force_host_platform_device_count=8 via tests/"
              f"conftest.py pattern or run under SSA_TPU_PLATFORM=cpu "
              f"with the flag)", file=sys.stderr)
        raise SystemExit(2)

    config = default_config()
    config.defrost()
    config.DATA.IMG_SIZE = args.img
    config.MODEL.FREEZE_ENCODER = False
    config.freeze()

    common = dict(
        img_size=args.img, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=7, dtype=jnp.bfloat16,
        gelu_tanh=True,
    )
    # Replicated single-device layout: the XLA path a kernel-less chip
    # runs (kernels change temp accounting via their own VMEM scratch —
    # keep both layouts on the XLA path so the comparison is pure GSPMD).
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    _probe(MSUNet(**common), config, args.img, args.batch,
           mesh1, lambda path, leaf: P(), "replicated")

    mesh_tp = make_mesh(n_data=1, n_model=args.tp,
                        devices=jax.devices()[:args.tp])
    _probe(MSUNet(model_axis="model", **common), config, args.img,
           args.batch, mesh_tp,
           lambda path, leaf: _tp_spec(path, leaf), f"tp={args.tp}")


if __name__ == "__main__":
    main()
