"""Composite-kernel DSL demo.

Reference: /root/reference/examples/kernel_dsl — building MCMC kernels from
primitives with composition (seq/repeat/mixture), reversal derivation, and
stationarity checking.

Run: python examples/kernel_dsl.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import (checked, hmc, mala, mh_selection, mixture,
                               repeat, reversal, seq)


@gen
def model():
    mu = gt.normal(0.0, 2.0) @ "mu"
    sigma = gt.gamma(2.0, 1.0) @ "sigma"
    gt.normal(mu * jnp.ones(30), sigma) @ "ys"


def main(n_steps=800, seed=0):
    rng = np.random.default_rng(seed)
    data = 1.5 + 0.8 * rng.standard_normal(30)
    obs = choicemap(ys=jnp.asarray(data))
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    trace, _ = model.generate(k0, (), obs)

    # primitive kernels
    def mu_hmc(k, tr):
        return hmc(k, tr, select("mu"), L=5, eps=0.1)

    def mu_mala(k, tr):
        return mala(k, tr, select("mu"), 0.05)

    def sigma_mh(k, tr):
        return mh_selection(k, tr, select("sigma"))

    # composite: 2x(HMC on mu) ; randomly HMC-or-MALA ; sigma move
    kernel = seq(repeat(2, mu_hmc), mixture([0.5, 0.5], [mu_hmc, mu_mala]),
                 sigma_mh)
    rev = reversal(kernel)               # derived reversal (runs)
    # observation-preservation check once, eagerly
    checked(kernel, obs)(key, trace)

    # composite kernels jit: one fused step, scanned
    def step(tr, k):
        tr, _ = kernel(k, tr)
        return tr, (tr["mu"], tr["sigma"])

    key, k_run = jax.random.split(key)
    trace, (mus, sigmas) = jax.lax.scan(
        step, trace, jax.random.split(k_run, n_steps))
    mus, sigmas = np.asarray(mus), np.asarray(sigmas)

    burn = n_steps // 4
    mu_est = np.mean(mus[burn:])
    sd_est = np.mean(sigmas[burn:])
    print(f"posterior mu ≈ {mu_est:.3f} (data mean {data.mean():.3f})")
    print(f"posterior sigma ≈ {sd_est:.3f} (data sd {data.std():.3f})")
    assert abs(mu_est - data.mean()) < 0.2
    assert abs(sd_est - data.std()) < 0.3
    # reversal is also a valid kernel
    trace2, _ = rev(key, trace)
    print("kernel_dsl example OK")


if __name__ == "__main__":
    main()
