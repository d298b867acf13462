"""Checkpoint save/restore: one npz per step holding the whole train pytree.

Replaces the reference's three artifact families (PLY + MLP ckpt.pth + full
capture()/restore() torch pickles, SURVEY.md §5.4) with a single
path-flattened npz of {params, opt_state, gaussian state, step} — plus the
reference-format PLY export (data/ply.py) for interop. Unlike the reference's
restore path (which crashes on a self.self typo, gaussian_model.py:131), this
one round-trips and is covered by tests.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(tree))


def restore_checkpoint(path: str, template) -> Any:
    """Restore into the same pytree structure as `template`."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        leaves.append(jax.numpy.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
