"""MAP optimization by backtracking gradient ascent on selected choices.

Reference: /root/reference/src/inference/map_optimize.jl:9-41. The
backtracking line search is a ``lax.while_loop`` so the whole optimizer step
jits."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..diff import all_no_change
from ..gfi import Trace
from ..selection import Selection
from .common import select_trace


def map_optimize(trace: Trace, selection: Selection,
                 max_step_size: float = 0.1, tau: float = 0.5,
                 min_step_size: float = 1e-16):
    """One backtracking gradient-ascent move; returns the improved trace (or
    the original if no step size improved the score)."""
    gen_fn = trace.get_gen_fn()
    args = trace.get_args()
    argdiffs = all_no_change(args)

    _, values_chm, grad_chm = gen_fn.choice_gradients(trace, selection, None)
    values = values_chm.to_array()
    gradient = grad_chm.to_array()
    score = trace.get_score()

    def attempt(step_size):
        new_values = values + gradient * step_size
        new_trace, _, _, _ = gen_fn.update(
            None, trace, args, argdiffs, values_chm.from_array(new_values))
        return new_trace, new_trace.get_score()

    init_trace, init_score = attempt(jnp.asarray(max_step_size))

    def cond(state):
        step_size, _, new_score = state
        return (new_score - score < 0.0) & (step_size >= min_step_size)

    def body(state):
        step_size, _, _ = state
        step_size = tau * step_size
        new_trace, new_score = attempt(step_size)
        return (step_size, new_trace, new_score)

    _, new_trace, new_score = jax.lax.while_loop(
        cond, body, (jnp.asarray(max_step_size), init_trace, init_score))
    return select_trace(new_score >= score, new_trace, trace)
