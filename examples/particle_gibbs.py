"""Particle Gibbs with ancestor sampling + conjugate parameter updates.

The companion to examples/pmmh.py on the same nonlinear-in-parameters
state-space model: where PMMH explores the dynamics coefficient phi with a
pseudo-marginal MH step, Particle Gibbs alternates

  1. trajectory | phi  — a conditional-SMC sweep with ancestor sampling
     (gen_tpu.inference.particle_gibbs_step), and
  2. phi | trajectory  — an EXACT conjugate Gaussian draw (given the
     states, phi's likelihood is linear-Gaussian),

so the parameter step has zero pseudo-marginal noise. The whole chain
(SMC sweep + conjugate draw per iteration) compiles to ONE lax.scan.

No reference analogue (Gen.jl stops at PMMH; see docs/parity_inventory.md).

Run: python examples/particle_gibbs.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import gen
from gen_tpu.combinators.vector import VectorChoiceMap
from gen_tpu.inference import particle_gibbs_step
from gen_tpu.inference.smc import reconstruct_trajectories, smc_genealogy
from gen_tpu.utils import logsumexp

Q, R = 0.5, 0.4          # known noise scales
PHI_PRIOR_STD = 1.0      # phi ~ N(0, 1)


@gen
def ssm_kernel(t, prev, phi):
    x = gt.normal(phi * prev, Q) @ "x"
    gt.normal(x, R) @ "y"
    return x


def simulate_data(T, phi=0.8, seed=3):
    rng = np.random.default_rng(seed)
    x = 0.0
    ys = []
    for _ in range(T):
        x = phi * x + Q * rng.standard_normal()
        ys.append(x + R * rng.standard_normal())
    return np.asarray(ys)


def phi_conjugate_draw(key, xs):
    """phi | x_{0:T-1}: x_t ~ N(phi x_{t-1}, Q^2) with x_{-1}=0, so the
    full conditional is Gaussian with the usual normal-linear update."""
    prev = jnp.concatenate([jnp.zeros(1), xs[:-1]])
    prec = 1.0 / PHI_PRIOR_STD ** 2 + jnp.sum(prev ** 2) / Q ** 2
    mean = (jnp.sum(prev * xs) / Q ** 2) / prec
    return mean + jax.random.normal(key) / jnp.sqrt(prec)


def run_pg(key, ys, n_particles=128, n_sweeps=400):
    T = len(ys)
    obs = VectorChoiceMap(gt.ChoiceMap().set_value("y", jnp.asarray(ys)), T)

    k_init, k_pick, k_scan = jax.random.split(key, 3)

    @jax.jit
    def chain(k_init, k_pick, k_scan):
        # initialize the reference from an unconditional SMC draw at phi=0.5
        subs, anc, log_w, _ = smc_genealogy(
            k_init, ssm_kernel, 0.0, (0.5,), obs, n_particles)
        j = jax.random.categorical(k_pick, log_w - logsumexp(log_w))
        trajs = reconstruct_trajectories(subs, anc)
        ref = VectorChoiceMap(
            jax.tree_util.tree_map(lambda x: x[:, j], trajs).get_choices(), T)

        def sweep(carry, k):
            ref, phi = carry
            k_traj, k_phi = jax.random.split(k)
            ref, lml = particle_gibbs_step(
                k_traj, ssm_kernel, 0.0, (phi,), obs, ref, n_particles,
                ancestor_sampling=True)
            phi = phi_conjugate_draw(k_phi, ref.inner.get_value("x"))
            return (ref, phi), (phi, lml)

        _, (phis, lmls) = jax.lax.scan(
            sweep, (ref, jnp.asarray(0.5)), jax.random.split(k_scan,
                                                             n_sweeps))
        return phis, lmls

    return chain(k_init, k_pick, k_scan)


def main(T=60, n_particles=128, n_sweeps=400, seed=0):
    ys = simulate_data(T)
    phis, lmls = run_pg(jax.random.PRNGKey(seed), ys, n_particles, n_sweeps)
    burn = n_sweeps // 4
    phis = np.asarray(phis)
    post_mean = float(phis[burn:].mean())
    post_std = float(phis[burn:].std())
    print(f"phi posterior: {post_mean:.3f} +- {post_std:.3f} (true 0.8)")
    return post_mean, post_std


if __name__ == "__main__":
    post_mean, post_std = main()
    assert abs(post_mean - 0.8) < 4 * post_std + 0.05, (post_mean, post_std)
    print("OK")
