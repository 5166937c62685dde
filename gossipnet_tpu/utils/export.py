"""Portable parameter export/import (single NPZ file).

Orbax checkpoints (utils/checkpoint.py) are the training format; this is
the *serving interchange* format — one flat NPZ with '/'-joined tree
paths, loadable anywhere numpy exists (analogous to exporting the
reference's tf.train.Saver checkpoints to a plain weights file).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def flatten_paths(params) -> dict:
    """Param tree -> {'a/b/c': leaf} with '/'-joined key paths."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(str(k.key) for k in keypath): np.asarray(leaf)
            for keypath, leaf in flat}


def unflatten_paths(flat: dict) -> dict:
    """Inverse of :func:`flatten_paths` (the NPZ key convention)."""
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str | Path, params) -> None:
    np.savez_compressed(path, **flatten_paths(params))


def load_params_npz(path: str | Path) -> dict:
    data = np.load(path)
    return unflatten_paths({k: data[k] for k in data.files})
