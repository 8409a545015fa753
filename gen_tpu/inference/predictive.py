"""Prior and posterior predictive sampling.

No reference analogue as library functions (Gen.jl users re-run the model
by hand). Given posterior draws over some latents — from
:func:`~gen_tpu.inference.sample.sample_posterior`, a PG chain, or any
dict of per-address sample arrays — the predictive re-runs the model with
those latents constrained and everything else (in particular the
observation addresses) freshly sampled. One ``vmap`` over draws; pass new
``args`` to predict at new design points (the GFI makes this free: the
latents are constrained by address, not by position).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap
from ..gfi import GenerativeFunction


def _stack_draws(samples: Dict):
    """dict addr -> arrays with LEADING (draws, chains) axes (event dims
    after; exactly ``PosteriorSamples.samples``), or 1-D (draws,) for
    scalar addresses. A 2-D array is always read as (draws, chains) — for
    draws of a vector-valued address from a single chain, add the chain
    axis explicitly (``arr[:, None, :]``)."""
    leaves = {}
    n = None
    for addr, arr in samples.items():
        arr = jnp.asarray(arr)
        flat = arr.reshape((-1,) + arr.shape[2:]) if arr.ndim >= 2 else arr
        leaves[addr] = flat
        if n is None:
            n = flat.shape[0]
        elif flat.shape[0] != n:
            raise ValueError("sample arrays disagree on draw count")
    return n, leaves


def posterior_predictive(key, model: GenerativeFunction, args: Tuple,
                         samples: Dict, num_draws: Optional[int] = None):
    """Sample the predictive distribution of all UNCONSTRAINED addresses.

    ``samples``: address -> array with leading (draws, chains) axes (as
    returned in ``PosteriorSamples.samples``) or a single leading draws
    axis. Returns a ChoiceMap whose leaves have a leading draw axis —
    ``result.get_value("ys")`` is the (num_draws, ...) predictive for
    address "ys".
    """
    n_total, leaves = _stack_draws(samples)
    n = num_draws or n_total
    if n > n_total:
        raise ValueError(f"requested {n} draws but only {n_total} samples")
    idx = jnp.linspace(0, n_total - 1, n).astype(jnp.int32)

    def one(k, i):
        cons = ChoiceMap()
        for addr, flat in leaves.items():
            cons = cons.set_value(addr, flat[i])
        trace, _ = model.generate(k, args, cons)
        return trace.get_choices()

    return jax.vmap(one)(jax.random.split(key, n), idx)


def prior_predictive(key, model: GenerativeFunction, args: Tuple,
                     num_draws: int):
    """Forward-simulate ``num_draws`` full traces; returns a ChoiceMap with
    a leading draw axis per address."""
    def one(k):
        return model.simulate(k, args).get_choices()

    return jax.vmap(one)(jax.random.split(key, num_draws))
