"""Metropolis–Hastings.

Reference: /root/reference/src/inference/mh.jl (three forms: selection-based
via regenerate, custom-proposal, and involutive via trace translators — the
involutive form lives in trace_translators.py).

Each function is a pure (key, trace, ...) → (trace, accepted) step: wrap in
``jax.jit`` for a fused kernel, ``vmap`` for many chains, ``lax.scan`` for a
chain. Acceptance is computed in log space and the new/old trace selected
with a fused ``where`` over the trace pytree."""

from __future__ import annotations

from typing import Tuple

import jax

from ..diff import all_no_change
from ..gfi import GenerativeFunction, Trace
from ..selection import Selection
from .common import mh_accept, select_trace


def mh(key, trace: Trace, selection: Selection = None,
       proposal: GenerativeFunction = None, proposal_args: Tuple = ()):
    """Dispatch like the reference's ``metropolis_hastings`` overloads."""
    if selection is not None:
        return mh_selection(key, trace, selection)
    if proposal is not None:
        return mh_proposal(key, trace, proposal, proposal_args)
    raise ValueError("mh: provide a selection or a proposal")


metropolis_hastings = mh


def mh_selection(key, trace: Trace, selection: Selection):
    """Selection MH: resample the selected addresses from the internal
    proposal and accept on the regenerate weight (mh.jl:15-29)."""
    k1, k2 = jax.random.split(key)
    new_trace, weight, _ = trace.regenerate(k1, selection)
    accept = mh_accept(k2, weight)
    return select_trace(accept, new_trace, trace), accept


def mh_proposal(key, trace: Trace, proposal: GenerativeFunction,
                proposal_args: Tuple = ()):
    """Custom-proposal MH (mh.jl:41-62): propose → update → assess the
    discard under the reverse proposal; α = weight − fwd + bwd. The proposal
    is a generative function whose first argument is the current trace."""
    k1, k2, k3 = jax.random.split(key, 3)
    fwd_choices, fwd_weight, _ = proposal.propose(
        k1, (trace,) + tuple(proposal_args))
    model_args = trace.get_args()
    new_trace, weight, _, discard = trace.get_gen_fn().update(
        k2, trace, model_args, all_no_change(model_args), fwd_choices)
    bwd_weight, _ = proposal.assess((new_trace,) + tuple(proposal_args),
                                    discard)
    accept = mh_accept(k3, weight - fwd_weight + bwd_weight)
    return select_trace(accept, new_trace, trace), accept
