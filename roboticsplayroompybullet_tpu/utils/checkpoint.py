"""Checkpoint / resume: exact pytree snapshots of env + solver state.

The reference has NO checkpointing; its closest mechanism is state
injection via `reset(o)`, which does NOT restore object velocities
(reference environments.py:520 TODO). Here env state is an explicit
immutable pytree (envs/state.py), so checkpointing is a plain array dump —
exact, velocities included (SURVEY.md §5).

Format: one .npz with the flattened leaves + a JSON sidecar entry holding
the treedef (serialized as the pytree structure string is not portable, so
we store leaves keyed by flattened index and rebuild against a matching
template). Restore therefore requires a template pytree with the same
structure — natural here, since configs are static.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax


def save_pytree(path: str, tree: Any) -> None:
    """Write a pytree of arrays to `path` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__n_leaves__"] = np.asarray(len(leaves))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)              # atomic: no torn checkpoints


def load_pytree(path: str, template: Any) -> Any:
    """Rebuild a pytree saved by `save_pytree` onto `template`'s structure."""
    with np.load(path) as data:
        n = int(data["__n_leaves__"])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(t_leaves)}")
    cast = [jax.numpy.asarray(l, t.dtype if hasattr(t, "dtype") else None)
            for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
