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


def save_params_npz(path: str | Path, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    blob = {
        "/".join(str(k.key) for k in keypath): np.asarray(leaf)
        for keypath, leaf in flat
    }
    np.savez_compressed(path, **blob)


def load_params_npz(path: str | Path) -> dict:
    data = np.load(path)
    params: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params
