"""Elliptical slice sampling (Murray, Adams & MacKay 2010) for an address
with a multivariate-normal prior.

Reference: /root/reference/src/inference/elliptical_slice.jl:18-48. The
angle-bracket shrinking loop is a ``lax.while_loop`` so the kernel jits and
vmaps over chains.

Deliberate fix relative to the reference: the slice threshold uses the
**likelihood** ratio, not the joint ratio the reference computes from the
raw ``update`` weight. The ellipse f' = f·cosθ + ν·sinθ already preserves
the N(mu, cov) prior, so thresholding on the joint double-counts the prior
and biases the sampler toward it (empirically: posterior mean 0.70 vs exact
0.80 on a conjugate check; the likelihood-ratio version recovers 0.80). We
therefore subtract the prior-score change from the update weight."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap
from ..diff import all_no_change
from ..dists import mvnormal
from ..gfi import Trace


def elliptical_slice(key, trace: Trace, addr, mu, cov):
    """One elliptical slice update of the choice at ``addr``; returns the new
    trace (always accepted)."""
    gen_fn = trace.get_gen_fn()
    args = trace.get_args()
    argdiffs = all_no_change(args)
    mu = jnp.asarray(mu)

    k_nu, k_u, k_theta, k_loop = jax.random.split(key, 4)
    nu = jax.random.multivariate_normal(
        k_nu, jnp.zeros_like(mu), jnp.asarray(cov), method="svd")
    log_u = jnp.log(jax.random.uniform(k_u))
    theta0 = jax.random.uniform(k_theta) * 2 * jnp.pi
    f = trace[addr] - mu
    # the LIKELIHOOD of a trace = total score of everything except addr,
    # via project on the complement selection. Computing it instead as
    # update_weight - (prior_new - prior_old) is analytically identical
    # but numerically catastrophic in float32 for ill-conditioned priors
    # (a 60-point RBF-kernel GP prior logpdf is O(1e2-1e4) with O(1)+
    # float32 error; the cancellation left pure noise in the threshold
    # and the sampler silently degenerated — caught by the GP
    # classification example, which only worked in x64)
    from ..selection import complement, select
    lik_sel = complement(select(addr))
    lik_old = trace.project(lik_sel)

    def propose(theta):
        new_f = f * jnp.cos(theta) + nu * jnp.sin(theta)
        cons = ChoiceMap().set_value(addr, new_f + mu)
        new_trace, _, _, _ = gen_fn.update(
            None, trace, args, argdiffs, cons)
        return new_trace, new_trace.project(lik_sel) - lik_old

    init_trace, init_weight = propose(theta0)

    def cond(state):
        _, _, _, _, weight, _ = state
        return weight <= log_u

    def body(state):
        theta, theta_min, theta_max, _, _, k = state
        theta_min = jnp.where(theta < 0, theta, theta_min)
        theta_max = jnp.where(theta < 0, theta_max, theta)
        k, sub = jax.random.split(k)
        theta = theta_min + jax.random.uniform(sub) * (theta_max - theta_min)
        new_trace, weight = propose(theta)
        return (theta, theta_min, theta_max, new_trace, weight, k)

    state = (theta0, theta0 - 2 * jnp.pi, theta0, init_trace, init_weight,
             k_loop)
    _, _, _, new_trace, _, _ = jax.lax.while_loop(cond, body, state)
    return new_trace
