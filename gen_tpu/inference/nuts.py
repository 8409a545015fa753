"""No-U-Turn Sampler with dual-averaging step-size adaptation.

Not in the reference (which stops at fixed-parameter HMC, hmc.jl); required
by the north star (BASELINE.md: "HMC/NUTS + dual-averaging, many chains
vmapped"). This is the *iterative* multinomial NUTS (Hoffman & Gelman 2014;
progressive multinomial sampling per Betancourt 2017; iterative subtree
U-turn checking via the power-of-two checkpoint scheme of Phan et al. 2019)
— O(max_depth) memory, O(1) program size, every loop a ``lax.while_loop``,
so one chain step is a single fused XLA computation and thousands of chains
vmap over it.

The potential is a :class:`~gen_tpu.inference.target.FlatTarget` over the
selected choices; supports a diagonal mass matrix."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..selection import Selection
from ..utils import sqrt_mass_safe
from .target import FlatTarget


class NUTSStats(NamedTuple):
    accept_prob: jnp.ndarray   # mean MH accept statistic (for dual averaging)
    num_leapfrogs: jnp.ndarray
    depth: jnp.ndarray
    diverging: jnp.ndarray


def _uturn(rho, r_a, r_b, inv_mass):
    va = inv_mass * r_a
    vb = inv_mass * r_b
    return (jnp.dot(rho, va) <= 0) | (jnp.dot(rho, vb) <= 0)


def nuts_flat(key, value_and_grad, theta0, step_size, max_depth=10,
              inv_mass_diag=None, divergence_threshold=1000.0):
    """One NUTS transition on a flat vector. Returns (theta, stats)."""
    dim = theta0.shape[0]
    inv_mass = (jnp.ones(dim, dtype=theta0.dtype) if inv_mass_diag is None
                else jnp.asarray(inv_mass_diag))
    sqrt_mass = sqrt_mass_safe(inv_mass)

    logp0, grad0 = value_and_grad(theta0)
    k_mom, k_loop = jax.random.split(key)
    r0 = sqrt_mass * jax.random.normal(k_mom, (dim,), dtype=theta0.dtype)
    energy0 = logp0 - 0.5 * jnp.dot(r0, inv_mass * r0)

    def leapfrog(theta, r, grad, eps):
        r = r + 0.5 * eps * grad
        theta = theta + eps * (inv_mass * r)
        logp, grad = value_and_grad(theta)
        r = r + 0.5 * eps * grad
        return theta, r, grad, logp

    def build_subtree(key, state, eps_signed, num_leaves):
        """Integrate num_leaves leapfrogs from `state`, checking internal
        (power-of-two block) U-turns with checkpoint stacks."""
        theta, r, grad = state
        r_ckpt = jnp.zeros((max_depth + 1, dim), dtype=theta0.dtype)
        rsum_ckpt = jnp.zeros((max_depth + 1, dim), dtype=theta0.dtype)

        init = dict(
            n=jnp.asarray(0), theta=theta, r=r, grad=grad,
            rho=jnp.zeros(dim, dtype=theta0.dtype),
            cand_theta=theta, cand_logw=-jnp.inf,
            logw=-jnp.inf, turning=jnp.asarray(False),
            diverging=jnp.asarray(False), alpha=jnp.asarray(0.0),
            r_ckpt=r_ckpt, rsum_ckpt=rsum_ckpt, key=key,
        )

        def cond(s):
            return (s["n"] < num_leaves) & ~s["turning"] & ~s["diverging"]

        def body(s):
            n = s["n"]
            # rho checkpoint for blocks starting at this leaf: level k
            # applies when n % 2^k == 0 (rho BEFORE the block's first leaf,
            # so block_rho below sums exactly the in-block leaf momenta)
            r_ck, rs_ck = s["r_ckpt"], s["rsum_ckpt"]
            for k in range(1, max_depth + 1):
                starts = (n % (2 ** k)) == 0
                rs_ck = rs_ck.at[k].set(jnp.where(starts, s["rho"], rs_ck[k]))

            theta, r, grad, logp = leapfrog(s["theta"], s["r"], s["grad"],
                                            eps_signed)
            # momentum checkpoint: the block's FIRST IN-BLOCK state (i.e.
            # AFTER this leapfrog). Using the pre-block boundary momentum
            # instead makes the stopping rule asymmetric under direction
            # reversal and measurably biases the invariant distribution
            # (var 0.90 instead of 1.00 on a 3-D standard normal at
            # eps=0.5 — the reversed trajectory would check different
            # (first, last) pairs, breaking detailed balance).
            for k in range(1, max_depth + 1):
                starts = (n % (2 ** k)) == 0
                r_ck = r_ck.at[k].set(jnp.where(starts, r, r_ck[k]))
            energy = logp - 0.5 * jnp.dot(r, inv_mass * r)
            delta = energy - energy0
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            diverging = delta < -divergence_threshold
            alpha = s["alpha"] + jnp.minimum(1.0, jnp.exp(delta))

            # progressive multinomial candidate within the subtree
            logw_new = jnp.logaddexp(s["logw"], delta)
            key, k_take = jax.random.split(s["key"])
            take = jnp.log(jax.random.uniform(k_take)) < delta - logw_new
            cand_theta = jnp.where(take, theta, s["cand_theta"])

            rho = s["rho"] + r

            # U-turn checks for blocks ending at this leaf: level k applies
            # when (n+1) % 2^k == 0
            turning = s["turning"]
            for k in range(1, max_depth + 1):
                ends = ((n + 1) % (2 ** k)) == 0
                block_rho = rho - rs_ck[k]
                turn_k = _uturn(block_rho, r_ck[k], r, inv_mass)
                turning = turning | (ends & turn_k)

            return dict(n=n + 1, theta=theta, r=r, grad=grad, rho=rho,
                        cand_theta=cand_theta, cand_logw=logw_new,
                        logw=logw_new, turning=turning, diverging=diverging,
                        alpha=alpha, r_ckpt=r_ck, rsum_ckpt=rs_ck, key=key)

        out = jax.lax.while_loop(cond, body, init)
        return out

    init_state = dict(
        theta_left=theta0, r_left=r0, grad_left=grad0,
        theta_right=theta0, r_right=r0, grad_right=grad0,
        rho=r0, cand_theta=theta0, logw=jnp.asarray(0.0),
        depth=jnp.asarray(0), turning=jnp.asarray(False),
        diverging=jnp.asarray(False), alpha_sum=jnp.asarray(0.0),
        n_leapfrog=jnp.asarray(0), key=k_loop,
    )

    def cond(s):
        return (s["depth"] < max_depth) & ~s["turning"] & ~s["diverging"]

    def body(s):
        key, k_dir, k_sub, k_acc = jax.random.split(s["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        num_leaves = 2 ** s["depth"]

        start_right = (s["theta_right"], s["r_right"], s["grad_right"])
        start_left = (s["theta_left"], s["r_left"], s["grad_left"])
        start = jax.tree_util.tree_map(
            lambda a, b: jnp.where(go_right, a, b), start_right, start_left)
        eps_signed = jnp.where(go_right, step_size, -step_size)

        sub = build_subtree(k_sub, start, eps_signed, num_leaves)
        ok = ~sub["turning"] & ~sub["diverging"]

        # biased progressive sampling between tree and subtree
        take = (jnp.log(jax.random.uniform(k_acc))
                < sub["logw"] - s["logw"]) & ok
        cand_theta = jnp.where(take, sub["cand_theta"], s["cand_theta"])
        logw = jnp.where(ok, jnp.logaddexp(s["logw"], sub["logw"]), s["logw"])

        # extend the chosen endpoint (only when subtree valid)
        def upd(cur, new):
            return jnp.where(ok, new, cur)

        theta_right = jnp.where(go_right, upd(s["theta_right"], sub["theta"]),
                                s["theta_right"])
        r_right = jnp.where(go_right, upd(s["r_right"], sub["r"]),
                            s["r_right"])
        grad_right = jnp.where(go_right, upd(s["grad_right"], sub["grad"]),
                               s["grad_right"])
        theta_left = jnp.where(go_right, s["theta_left"],
                               upd(s["theta_left"], sub["theta"]))
        r_left = jnp.where(go_right, s["r_left"], upd(s["r_left"], sub["r"]))
        grad_left = jnp.where(go_right, s["grad_left"],
                              upd(s["grad_left"], sub["grad"]))

        rho = jnp.where(ok, s["rho"] + sub["rho"], s["rho"])
        turning_total = _uturn(rho, r_left, r_right, inv_mass)
        turning = sub["turning"] | (ok & turning_total)

        return dict(
            theta_left=theta_left, r_left=r_left, grad_left=grad_left,
            theta_right=theta_right, r_right=r_right, grad_right=grad_right,
            rho=rho, cand_theta=cand_theta, logw=logw,
            depth=s["depth"] + 1, turning=turning,
            diverging=s["diverging"] | sub["diverging"],
            alpha_sum=s["alpha_sum"] + sub["alpha"],
            n_leapfrog=s["n_leapfrog"] + sub["n"], key=key)

    out = jax.lax.while_loop(cond, body, init_state)
    n = jnp.maximum(out["n_leapfrog"], 1)
    stats = NUTSStats(accept_prob=out["alpha_sum"] / n,
                      num_leapfrogs=out["n_leapfrog"],
                      depth=out["depth"],
                      diverging=out["diverging"])
    return out["cand_theta"], stats


def nuts(key, trace, selection: Selection, step_size, max_depth=10,
         inv_mass_diag=None):
    """One NUTS update on a trace's selected choices. Returns
    (new_trace, stats)."""
    target = FlatTarget(trace, selection)
    theta, stats = nuts_flat(key, target.value_and_grad, target.flat0,
                             step_size, max_depth, inv_mass_diag)
    return target.rebuild(theta), stats


# -- dual averaging (Hoffman & Gelman 2014, §3.2) -------------------------


class DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(eps0):
    eps0 = jnp.asarray(eps0, dtype=jnp.result_type(float))
    return DAState(jnp.log(eps0), jnp.asarray(0.0, dtype=eps0.dtype),
                   jnp.asarray(0.0, dtype=eps0.dtype),
                   jnp.asarray(1.0, dtype=eps0.dtype),
                   jnp.log(10.0 * eps0))


def da_update(state: DAState, accept_prob, target_accept=0.8, gamma=0.05,
              t0=10.0, kappa=0.75):
    t = state.t
    h_bar = ((1.0 - 1.0 / (t + t0)) * state.h_bar
             + (target_accept - accept_prob) / (t + t0))
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * state.log_eps_bar
    return DAState(log_eps, log_eps_bar, h_bar, t + 1.0, state.mu)


def find_reasonable_step_size(key, value_and_grad, theta0, inv_mass=None):
    """Heuristic of Hoffman & Gelman algorithm 4, as a ``lax.while_loop``
    so the whole warmup pipeline jits and vmaps over chains."""
    dim = theta0.shape[0]
    inv_mass = jnp.ones(dim, theta0.dtype) if inv_mass is None else inv_mass
    logp0, grad0 = value_and_grad(theta0)
    r0 = sqrt_mass_safe(inv_mass) * jax.random.normal(
        key, (dim,), theta0.dtype)
    h0 = logp0 - 0.5 * jnp.dot(r0, inv_mass * r0)
    log_half = jnp.log(0.5)

    def h_after(eps):
        r = r0 + 0.5 * eps * grad0
        theta = theta0 + eps * inv_mass * r
        logp, grad = value_and_grad(theta)
        r = r + 0.5 * eps * grad
        h = logp - 0.5 * jnp.dot(r, inv_mass * r)
        return jnp.where(jnp.isnan(h), -jnp.inf, h)

    delta0 = h_after(1.0) - h0
    direction = jnp.where(delta0 > log_half, 1.0, -1.0)

    def cond(state):
        eps, it = state
        delta = h_after(eps) - h0
        keep = jnp.where(direction > 0, delta > log_half, delta < log_half)
        return keep & (it < 50)

    def body(state):
        eps, it = state
        return eps * (2.0 ** direction), it + 1

    eps, _ = jax.lax.while_loop(cond, body,
                                (jnp.asarray(1.0, theta0.dtype),
                                 jnp.asarray(0)))
    return eps


def nuts_warmup_and_sample(key, trace, selection: Selection, num_warmup=500,
                           num_samples=1000, max_depth=10, target_accept=0.8,
                           adapt_mass=True):
    """Full single-chain pipeline: dual-averaging warmup (+ diagonal mass
    estimation from the second half of warmup), then sampling. Returns
    (samples_flat, final_trace, info dict). Entirely scanned/jitted; vmap
    over (key, trace) for many chains."""
    target = FlatTarget(trace, selection)
    dim = target.dim
    k_find, k_warm, k_samp = jax.random.split(key, 3)
    eps0 = find_reasonable_step_size(k_find, target.value_and_grad,
                                     target.flat0)

    def warm_step(carry, step_key):
        theta, da, mean, m2, count = carry
        eps = jnp.exp(da.log_eps)
        theta, stats = nuts_flat(step_key, target.value_and_grad, theta, eps,
                                 max_depth)
        da = da_update(da, stats.accept_prob, target_accept)
        # Welford on the second half of warmup
        active = da.t > (num_warmup // 2)
        count2 = count + jnp.where(active, 1.0, 0.0)
        delta = theta - mean
        mean2 = mean + jnp.where(active, delta / jnp.maximum(count2, 1.0), 0.0)
        m22 = m2 + jnp.where(active, delta * (theta - mean2), 0.0)
        return (theta, da, mean2, m22, count2), stats.accept_prob

    init = (target.flat0, da_init(eps0), jnp.zeros(dim), jnp.zeros(dim),
            jnp.asarray(0.0))
    (theta, da, mean, m2, count), warm_accepts = jax.lax.scan(
        warm_step, init, jax.random.split(k_warm, num_warmup))
    eps_final = jnp.exp(da.log_eps_bar)
    var = m2 / jnp.maximum(count - 1.0, 1.0)
    inv_mass = jnp.where(jnp.asarray(adapt_mass) & (count > 2),
                         jnp.maximum(var, 1e-6), jnp.ones(dim))

    def samp_step(theta, step_key):
        theta, stats = nuts_flat(step_key, target.value_and_grad, theta,
                                 eps_final, max_depth, inv_mass)
        return theta, (theta, stats.accept_prob, stats.num_leapfrogs)

    theta, (samples, accepts, leapfrogs) = jax.lax.scan(
        samp_step, theta, jax.random.split(k_samp, num_samples))
    final_trace = target.rebuild(theta)
    info = dict(step_size=eps_final, inv_mass_diag=inv_mass,
                mean_accept=jnp.mean(accepts),
                total_leapfrogs=jnp.sum(leapfrogs))
    return samples, final_trace, info

