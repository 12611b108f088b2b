"""Native checkpoint I/O (Orbax, with an npz fallback).

The reference is load-only (utils/load_models.py); this framework also
*saves* — converted torch checkpoints and training state persist as native
JAX checkpoints so conversion happens once.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def save_checkpoint(path: str, pytree: Any) -> None:
    """Save a parameter pytree. ``.npz`` → flat npz; else Orbax directory."""
    if path.endswith(".npz"):
        flat = _flatten(pytree)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pytree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            flat = {k: f[k] for k in f.files}
        return _unflatten(flat)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))


_SEP = "|"


def _flatten(tree: Any) -> dict:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{_SEP}{k}" if prefix else str(k), v)
        else:
            flat[prefix] = node

    rec("", tree)
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree
