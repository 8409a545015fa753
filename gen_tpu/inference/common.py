"""Shared inference utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap
from ..selection import Selection


def select_trace(accept, new_trace, old_trace):
    """Pick between two traces by a (possibly traced) boolean.

    When the traces have identical pytree structure and leaf shapes (the
    common, jit-compatible case) this is a fused ``jnp.where`` over leaves.
    When a structure-changing move produced a different trace shape (only
    possible eagerly), fall back to concrete host-side selection."""
    new_leaves, new_def = jax.tree_util.tree_flatten(new_trace)
    old_leaves, old_def = jax.tree_util.tree_flatten(old_trace)
    if new_def == old_def and all(
            jnp.shape(a) == jnp.shape(b)
            for a, b in zip(new_leaves, old_leaves)):
        picked = [
            jnp.where(accept, jnp.asarray(a), jnp.asarray(b))
            for a, b in zip(new_leaves, old_leaves)
        ]
        return jax.tree_util.tree_unflatten(new_def, picked)
    return new_trace if bool(accept) else old_trace


def mh_accept(key, log_alpha):
    """Standard MH accept decision: log u < log alpha."""
    return jnp.log(jax.random.uniform(key)) < log_alpha


def flat_selected(trace, selection: Selection):
    """(values_vector, rebuild) for the selected continuous choices — the
    analogue of the reference's ``to_array(values_trie)`` path in HMC/MALA
    (/root/reference/src/inference/hmc.jl:31-41)."""
    values_chm = trace.get_choices().filter(selection)
    vec = values_chm.to_array()

    def rebuild(v) -> ChoiceMap:
        return values_chm.from_array(v)

    return vec, rebuild
