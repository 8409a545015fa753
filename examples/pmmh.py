"""Particle-marginal Metropolis–Hastings (PMMH).

Reference: /root/reference/examples/pmmh/ — a particle filter wrapped as a
pseudo-marginal likelihood estimator inside an MH loop over static
parameters of a nonlinear state-space model.

Run: python examples/pmmh.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import Unfold, gen
from gen_tpu.diff import IntDiff, NoChange
from gen_tpu.inference import (initialize_particle_filter, log_ml_estimate,
                               maybe_resample, particle_filter_step)


@gen
def ssm_kernel(t, prev, phi, q, r):
    x = gt.normal(phi * prev, q) @ "x"
    gt.normal(x, r) @ "y"
    return x


ssm = Unfold(ssm_kernel)


def simulate_data(T, phi=0.8, q=0.5, r=0.4, seed=3):
    rng = np.random.default_rng(seed)
    x = 0.0
    ys = []
    for _ in range(T):
        x = phi * x + q * rng.standard_normal()
        ys.append(x + r * rng.standard_normal())
    return np.asarray(ys)


def pf_log_ml(key, ys, phi, q, r, n_particles):
    """Run the particle filter to completion; returns the log-ML estimate.
    The per-step extension rides Unfold's O(1) fast path."""
    T = len(ys)

    def obs_at(t):
        c = gt.ChoiceMap()
        c.set_value((t, "y"), float(ys[t]))
        return c

    key, k0 = jax.random.split(key)
    state = initialize_particle_filter(
        k0, ssm, (1, 0.0, phi, q, r), obs_at(0), n_particles)
    for t in range(1, T):
        key, kr, ks = jax.random.split(key, 3)
        state, _ = maybe_resample(kr, state)
        state = particle_filter_step(
            ks, state, (t + 1, 0.0, phi, q, r),
            (IntDiff(1), NoChange, NoChange, NoChange, NoChange), obs_at(t))
    return log_ml_estimate(state)


def main(n_iters=120, n_particles=300, T=25, seed=0):
    ys = simulate_data(T)
    key = jax.random.PRNGKey(seed)

    # PMMH over phi with q, r known: pseudo-marginal MH where the PF's
    # log-ML plays the role of the (intractable) marginal likelihood
    # (reference examples/pmmh/pf.jl:40-62).
    phi = 0.3
    k_init, key = jax.random.split(key)
    log_ml = pf_log_ml(k_init, ys, phi, 0.5, 0.4, n_particles)
    prior = lambda p: gt.normal.logpdf(p, 0.0, 1.0)

    phis = []
    accepts = 0
    for i in range(n_iters):
        key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
        phi_new = phi + 0.15 * float(jax.random.normal(k_prop))
        log_ml_new = pf_log_ml(k_pf, ys, phi_new, 0.5, 0.4, n_particles)
        alpha = (float(log_ml_new) + float(prior(phi_new))
                 - float(log_ml) - float(prior(phi)))
        if np.log(float(jax.random.uniform(k_acc))) < alpha:
            phi, log_ml = phi_new, log_ml_new
            accepts += 1
        phis.append(phi)

    est = np.mean(phis[n_iters // 3:])
    print(f"PMMH posterior mean phi ≈ {est:.3f} (true 0.8), "
          f"accept rate {accepts / n_iters:.2f}")
    assert abs(est - 0.8) < 0.25, est
    print("pmmh example OK")
    return est


if __name__ == "__main__":
    main()
