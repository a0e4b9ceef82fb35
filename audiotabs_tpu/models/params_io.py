"""Pickle-free checkpoint I/O: parameter pytrees as flat, path-keyed npz.

Model parameters here are pytrees of dicts/lists of arrays. Storing them
with ``np.save(..., allow_pickle=True)`` would execute arbitrary code from
a tampered weights file, so checkpoints are flattened to a plain npz whose
keys encode the tree path (``spec_enc/#0/conv_w``) and rebuilt structurally
on load — ``np.load`` stays at its safe default.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _flatten(tree: Any, prefix: str, out: dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k in tree:
            if "/" in str(k):
                raise ValueError(f"param key may not contain '/': {k!r}")
            _flatten(tree[k], f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}#{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def save_pytree_npz(path: str | os.PathLike, params: Any) -> None:
    flat: dict[str, np.ndarray] = {}
    _flatten(params, "", flat)
    np.savez(path, **flat)


def load_pytree_npz(path: str | os.PathLike) -> Any:
    """Rebuild the nested dict/list pytree from a flat path-keyed npz."""
    data = np.load(path)  # safe default: no pickle
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]

    def _rebuild(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
            return [_rebuild(v) for _, v in items]
        return {k: _rebuild(v) for k, v in node.items()}

    return _rebuild(root)
