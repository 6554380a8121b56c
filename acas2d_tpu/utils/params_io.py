"""Flat .npz (de)serialization of ActorCritic params.

The reference commits its trained models as SB3 zips (C13, SURVEY.md §2.1);
the framework's equivalent portable artifact is a flat npz of the flax param
tree — tiny (the policy is a 64x64 MLP), dependency-free to load, and
git-friendly.  Orbax remains the training-time checkpoint format
(utils/checkpoint.py); this is for shipping/committing policies.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


_SEP = "//"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def save_params_npz(path: str, params: Any) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> Dict[str, Any]:
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for key in flat.files:
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
