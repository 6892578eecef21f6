"""Flat-npz (de)serialization of parameter pytrees.

Used for the converted ImageNet/Monodepth2 weights (utils/torch_import.py
emits nested dicts; we store them as one .npz with '/'-joined key paths)
and for the per-module weight export that mirrors the reference's
per-model `state_dict` checkpoints (reference: model_tool/logger.py:60-68).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def tree_to_flat(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def flat_to_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_npz(path: str, tree) -> None:
    np.savez(path, **tree_to_flat(tree))


def load_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return flat_to_tree({k: data[k] for k in data.files})
