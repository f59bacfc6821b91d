"""Checkpoint / resume.

The reference saves ``{scene, sup_pool, phase}`` but restores only
``scene`` + ``phase`` — the sup-pool state_dict has unformatted-key bugs and
is silently dropped on resume (``core_exp_runner.py:217-221``,
``sup_info.py:332-341``), so resumed training loses all inpainted panos'
supervision. Here the FULL runner state round-trips.

Format: a single .npz of flattened numeric leaves (nested keys joined by
'/') — no pickle, portable, append-free. Arrays stay NumPy; scalars are
0-d arrays.
"""

from __future__ import annotations

import os

import numpy as np


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert "/" not in str(k), f"key {k!r} may not contain '/'"
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}/__len__"] = np.asarray(len(tree))
        tag = "T" if isinstance(tree, tuple) else "L"
        out[f"{prefix}/__seq__"] = np.asarray(tag)
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if "__len__" in node:
            n = int(node["__len__"])
            seq = [rebuild(node[str(i)]) for i in range(n)]
            return tuple(seq) if str(node["__seq__"]) == "T" else seq
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_checkpoint(path: str, state: dict):
    """state: nested dict/list/tuple of arrays & scalars."""
    flat: dict = {}
    _flatten("", state, flat)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        flat = {k: f[k] for k in f.files}
    return _unflatten(flat)
