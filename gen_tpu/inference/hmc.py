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
        eps: float = 0.1, inv_mass_diag=None):
    """One HMC update on the selected addresses (optionally with a diagonal
    mass matrix — a TPU-side extension; the reference uses identity mass,
    hmc.jl:1-9). Returns (new_trace, accepted)."""
    target = FlatTarget(trace, selection)
    values0 = target.flat0
    logp0, grad0 = target.value_and_grad(values0)
    inv_mass = (jnp.ones_like(values0) if inv_mass_diag is None
                else jnp.asarray(inv_mass_diag))
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)

    def kinetic(m):
        return 0.5 * jnp.dot(m, inv_mass * m)

    k_mom, k_acc = jax.random.split(key)
    momenta0 = sqrt_mass * jax.random.normal(k_mom, values0.shape,
                                             dtype=values0.dtype)
    prev_kinetic = kinetic(momenta0)

    def leapfrog(carry, _):
        values, momenta, grad = carry
        momenta = momenta + (eps / 2) * grad
        values = values + eps * (inv_mass * momenta)
        logp, grad = target.value_and_grad(values)
        momenta = momenta + (eps / 2) * grad
        return (values, momenta, grad), logp

    (values, momenta, _), logps = jax.lax.scan(
        leapfrog, (values0, momenta0, grad0), None, length=L)

    alpha = (logps[-1] - logp0 - kinetic(momenta) + prev_kinetic)
    alpha = jnp.where(jnp.isnan(alpha), -jnp.inf, alpha)
    accept = mh_accept(k_acc, alpha)

    new_trace = target.rebuild(values)
    return select_trace(accept, new_trace, trace), accept


def hmc_chain(key, trace: Trace, selection: Selection, n_steps: int,
              L: int = 10, eps: float = 0.1):
    """Run a whole HMC chain on the flat selected-choice vector: the scan
    carry is just (values, logp, grad) — no trace reconstruction or
    whole-trace select per step (those cost more than the leapfrogs for
    small models). Returns (final_trace, samples (n_steps, d), accepts).

    vmap over (key, trace) for many chains — though note: on TPU at very
    large chain counts, scan-of-vmap (a jitted per-step `hmc` inside your
    own lax.scan, as bench.py does) measured ~4x faster than
    vmap-of-this-scan; prefer hmc_chain for single/few chains or when the
    flat dimension is large."""
    target = FlatTarget(trace, selection)
    values0 = target.flat0
    logp0, grad0 = target.value_and_grad(values0)

    def step(carry, i):
        values, logp, grad = carry
        # fold per-step keys from the chain key: O(1) key material even
        # under vmap (pre-splitting n_steps keys per chain materializes a
        # (chains, steps) key tensor in HBM)
        k_mom, k_acc = jax.random.split(jax.random.fold_in(key, i))
        momenta0 = jax.random.normal(k_mom, values.shape, dtype=values.dtype)

        def leapfrog(c, _):
            v, m, g = c
            m = m + (eps / 2) * g
            v = v + eps * m
            lp, g = target.value_and_grad(v)
            m = m + (eps / 2) * g
            return (v, m, g), lp

        (v_new, m_new, g_new), lps = jax.lax.scan(
            leapfrog, (values, momenta0, grad), None, length=L)
        alpha = (lps[-1] - logp + _momenta_score(-m_new)
                 - _momenta_score(momenta0))
        alpha = jnp.where(jnp.isnan(alpha), -jnp.inf, alpha)
        accept = mh_accept(k_acc, alpha)
        values = jnp.where(accept, v_new, values)
        logp = jnp.where(accept, lps[-1], logp)
        grad = jnp.where(accept, g_new, grad)
        return (values, logp, grad), (values, accept)

    (values, _, _), (samples, accepts) = jax.lax.scan(
        step, (values0, logp0, grad0), jnp.arange(n_steps))
    return target.rebuild(values), samples, accepts
