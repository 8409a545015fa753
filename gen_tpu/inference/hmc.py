"""Hamiltonian Monte Carlo.

Reference: /root/reference/src/inference/hmc.jl (leapfrog over the
``to_array``-flattened selected choices, gradients from
``choice_gradients``, standard-normal momenta, MH-corrected accept).

TPU-native design: the potential is extracted ONCE as a flat closed-over
``logp`` (:class:`~gen_tpu.inference.target.FlatTarget`); the L-step
leapfrog is a ``lax.scan`` over value-and-grad of that potential — a single
fused XLA loop with no trace reconstruction inside (the reference re-runs
``update`` + ``choice_gradients`` on the full trace every step,
hmc.jl:42-55; the math is identical because the unselected choices are
fixed, so Δ(model score) = Δ logp). The trace is rebuilt once, at accept
time. ``vmap`` runs thousands of chains in one program."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gfi import Trace
from ..selection import Selection
from .common import mh_accept, select_trace
from .target import FlatTarget

_HALF_LOG_2PI = 0.9189385332046727


def _momenta_score(m):
    return jnp.sum(-0.5 * m * m - _HALF_LOG_2PI)


def hmc(key, trace: Trace, selection: Selection, L: int = 10,
        eps: float = 0.1):
    """One HMC update on the selected addresses. Returns
    (new_trace, accepted)."""
    target = FlatTarget(trace, selection)
    values0 = target.flat0
    logp0, grad0 = target.value_and_grad(values0)

    k_mom, k_acc = jax.random.split(key)
    momenta0 = jax.random.normal(k_mom, values0.shape, dtype=values0.dtype)
    prev_momenta_score = _momenta_score(momenta0)

    def leapfrog(carry, _):
        values, momenta, grad = carry
        momenta = momenta + (eps / 2) * grad
        values = values + eps * momenta
        logp, grad = target.value_and_grad(values)
        momenta = momenta + (eps / 2) * grad
        return (values, momenta, grad), logp

    (values, momenta, _), logps = jax.lax.scan(
        leapfrog, (values0, momenta0, grad0), None, length=L)

    new_model_score = logps[-1]
    new_momenta_score = _momenta_score(-momenta)
    alpha = (new_model_score - logp0
             + new_momenta_score - prev_momenta_score)
    alpha = jnp.where(jnp.isnan(alpha), -jnp.inf, alpha)
    accept = mh_accept(k_acc, alpha)

    new_trace = target.rebuild(values)
    return select_trace(accept, new_trace, trace), accept
