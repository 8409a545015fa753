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
from gen_tpu import Unfold, gen, vector_choicemap
from gen_tpu.combinators import UnfoldArena, smc_run
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


_ARENA = None
_PF_JIT = None


def pf_log_ml(key, ys, phi, q, r, n_particles):
    """Pseudo-marginal likelihood via the UnfoldArena SMC: the WHOLE filter
    is one jitted program (scan over time, vmap over particles), so every
    PMMH iteration reuses one compiled executable."""
    global _ARENA, _PF_JIT
    T = len(ys)
    if _ARENA is None:
        _ARENA = UnfoldArena(ssm_kernel, max_length=T)

        @jax.jit
        def _run(key, obs_inner, phi, q, r):
            from gen_tpu.combinators.vector import VectorChoiceMap
            obs = VectorChoiceMap(obs_inner, T)
            _, _, lml = smc_run(key, _ARENA, 0.0, (phi, q, r), obs,
                                n_particles)
            return lml

        _PF_JIT = _run
    obs = vector_choicemap(T, y=jnp.asarray(ys))
    return _PF_JIT(key, obs.inner, phi, q, r)


def main(n_iters=400, n_particles=1000, T=40, seed=0):
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
        phi_new = phi + 0.12 * float(jax.random.normal(k_prop))
        log_ml_new = pf_log_ml(k_pf, ys, phi_new, 0.5, 0.4, n_particles)
        alpha = (float(log_ml_new) + float(prior(phi_new))
                 - float(log_ml) - float(prior(phi)))
        if np.log(float(jax.random.uniform(k_acc))) < alpha:
            phi, log_ml = phi_new, log_ml_new
            accepts += 1
        phis.append(phi)

    est = np.mean(phis[n_iters // 3:])
    exact = exact_posterior_mean_phi(ys)
    print(f"PMMH posterior mean phi ≈ {est:.3f} "
          f"(exact posterior mean {exact:.3f}, true parameter 0.8), "
          f"accept rate {accepts / n_iters:.2f}")
    assert abs(est - exact) < 0.08, (est, exact)
    print("pmmh example OK")
    return est


def exact_posterior_mean_phi(ys, q=0.5, r=0.4):
    """Ground truth via Kalman-filter likelihood on a phi grid."""
    import math

    def kalman_lml(phi):
        A, Q, R = phi, q * q, r * r
        m, v, l = 0.0, 0.0, 0.0
        for t, y in enumerate(ys):
            pm, pv = (A * m, A * A * v + Q) if t else (0.0, Q)
            S = pv + R
            l += -0.5 * math.log(2 * math.pi * S) - 0.5 * (y - pm) ** 2 / S
            K = pv / S
            m, v = pm + K * (y - pm), (1 - K) * pv
        return l

    grid = np.linspace(0.0, 1.2, 49)
    lls = np.array([kalman_lml(p) - 0.5 * p * p for p in grid])
    w = np.exp(lls - lls.max())
    return float((grid * w).sum() / w.sum())


if __name__ == "__main__":
    main()
