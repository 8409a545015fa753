"""Checkpoint/resume for parameters and inference state.

The reference has NO serialization at all (SURVEY.md §5.4: params live in
in-memory Dicts). Here any array pytree — trainable-parameter stores,
batched MCMC chain traces, particle-filter states, optimizer states — can
be saved and restored. Storage is a single ``.npz`` with path-keyed leaves
(orbax-style restore-with-target: the pytree *structure* comes from a
template, so traces restore with their static gen-fn metadata intact)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _leaf_keys(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    keys = []
    vals = []
    for path, leaf in leaves_with_paths:
        keys.append(jax.tree_util.keystr(path) or "__root__")
        vals.append(np.asarray(leaf))
    return keys, vals


def save_pytree(path: str, tree: Any) -> str:
    """Save any array pytree (trace, PF state, params, optimizer state)."""
    keys, vals = _leaf_keys(tree)
    arrays = {f"leaf_{i}": v for i, v in enumerate(vals)}
    np.savez(path, __keys__=np.asarray(keys, dtype=object), **arrays)
    return path


def restore_pytree(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (an example pytree with the
    right treedef — e.g. a freshly built trace or state)."""
    with np.load(path, allow_pickle=True) as data:
        saved_keys = list(data["__keys__"])
        leaves = [data[f"leaf_{i}"] for i in range(len(saved_keys))]
    tgt_keys, tgt_vals = _leaf_keys(target)
    if tgt_keys != saved_keys:
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {saved_keys[:5]}...\n"
            f" target: {tgt_keys[:5]}...")
    treedef = jax.tree_util.tree_structure(target)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])


def save_params(fn, path: str) -> str:
    """Save a gen fn's trainable-parameter store."""
    return save_pytree(path, dict(fn.params))


def restore_params(fn, path: str) -> None:
    """Restore a gen fn's trainable parameters in place."""
    restored = restore_pytree(path, dict(fn.params))
    for k, v in restored.items():
        fn.params[k] = v
