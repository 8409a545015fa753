"""Hamiltonian Monte Carlo.

Reference: /root/reference/src/inference/hmc.jl (leapfrog over the
``to_array``-flattened selected choices, gradients from
``choice_gradients``, standard-normal momenta, MH-corrected accept).

TPU-native design: the L-step leapfrog is a ``lax.scan`` whose body is one
fused XLA computation — gradient of the model's joint logpdf w.r.t. the
selected flat vector plus the position/momentum updates. No per-step Python
or host↔device traffic; ``vmap`` runs thousands of chains in one program
(the reference is a Julia loop doing one chain per process)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..diff import all_no_change
from ..gfi import Trace
from ..selection import Selection
from .common import mh_accept, select_trace

_HALF_LOG_2PI = 0.9189385332046727


def _momenta_score(m):
    return jnp.sum(-0.5 * m * m - _HALF_LOG_2PI)


def hmc(key, trace: Trace, selection: Selection, L: int = 10,
        eps: float = 0.1):
    """One HMC update on the selected addresses.

    Returns (new_trace, accepted)."""
    gen_fn = trace.get_gen_fn()
    args = trace.get_args()
    argdiffs = all_no_change(args)

    _, values_chm, grad_chm = gen_fn.choice_gradients(trace, selection, None)
    values = values_chm.to_array()
    gradient = grad_chm.to_array()

    k_mom, k_acc = jax.random.split(key)
    momenta = jax.random.normal(k_mom, values.shape, dtype=values.dtype)
    prev_momenta_score = _momenta_score(momenta)
    prev_model_score = trace.get_score()

    def leapfrog(carry, _):
        values, momenta, gradient, cur_trace = carry
        momenta = momenta + (eps / 2) * gradient
        values = values + eps * momenta
        new_trace, _, _, _ = gen_fn.update(
            None, cur_trace, args, argdiffs, values_chm.from_array(values))
        _, _, g_chm = gen_fn.choice_gradients(new_trace, selection, None)
        gradient = g_chm.to_array()
        momenta = momenta + (eps / 2) * gradient
        return (values, momenta, gradient, new_trace), None

    (values, momenta, gradient, new_trace), _ = jax.lax.scan(
        leapfrog, (values, momenta, gradient, trace), None, length=L)

    new_model_score = new_trace.get_score()
    new_momenta_score = _momenta_score(-momenta)
    alpha = (new_model_score - prev_model_score
             + new_momenta_score - prev_momenta_score)
    accept = mh_accept(k_acc, alpha)
    return select_trace(accept, new_trace, trace), accept
