"""Checkpoint key/shape inspection (reference ``network/pretrained_weights``
tooling: ``short_look.py``, ``short_look_IMAGNET1K.py``, ``txt_to_excel.py``).

Dumps the parameter naming contract of a checkpoint — works for this
framework's msgpack checkpoints, raw flax param trees, and torch
``.pt``/``.pth`` payloads — and can diff two dumps to produce the key
mapping table the converters rely on.

    python -m semantic_segmentation_of_stylegan2_artifacts_tpu.tools.ckpt_inspect CKPT [--out FILE]
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

import numpy as np


def _flatten(tree, prefix="") -> List[Tuple[str, Tuple[int, ...]]]:
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out += _flatten(tree[k], f"{prefix}.{k}" if prefix else str(k))
    elif hasattr(tree, "shape"):
        out.append((prefix, tuple(tree.shape)))
    return out


def load_any(path: str) -> Dict:
    if path.endswith((".pt", ".pth")):
        from ..models.weight_convert import load_torch_state_dict

        sd = load_torch_state_dict(path)
        return {k: v for k, v in sd.items()}
    from ..train.checkpoint import restore_checkpoint

    return restore_checkpoint(path)


def dump_keys(path: str) -> List[Tuple[str, Tuple[int, ...]]]:
    tree = load_any(path)
    if all(not isinstance(v, dict) for v in tree.values()):
        # flat torch-style dict
        return [(k, tuple(np.shape(v))) for k, v in sorted(tree.items())
                if hasattr(v, "shape")]
    return _flatten(tree)


def diff_dumps(a: List[Tuple[str, Tuple[int, ...]]],
               b: List[Tuple[str, Tuple[int, ...]]]) -> Dict[str, List[str]]:
    """Shape-based candidate matching between two key dumps."""
    by_shape: Dict[Tuple[int, ...], List[str]] = {}
    for k, s in b:
        by_shape.setdefault(s, []).append(k)
    return {k: by_shape.get(s, []) for k, s in a}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--out", default=None, help="write key table to file")
    ap.add_argument("--diff", default=None,
                    help="second checkpoint: print shape-matched candidates")
    args = ap.parse_args(argv)
    rows = dump_keys(args.ckpt)
    lines = [f"{k} {list(s)}" for k, s in rows]
    text = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"{len(rows)} keys -> {args.out}")
    else:
        print(text)
    if args.diff:
        other = dump_keys(args.diff)
        matches = diff_dumps(rows, other)
        for k, cands in matches.items():
            print(f"{k} -> {cands[:3]}")


if __name__ == "__main__":
    main()
