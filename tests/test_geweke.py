"""Geweke joint-distribution tests (Geweke 2004): the marginal-conditional
sampler (forward simulation of p(theta, y)) and the successive-conditional
sampler (alternate an MCMC kernel targeting p(theta | y) with resampling
y ~ p(y | theta)) must produce the SAME joint distribution. Any error in a
regenerate/update/HMC weight anywhere in the stack shifts the successive
sampler's moments — this is the whole-framework analogue of the reference's
per-case weight arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import hmc

KEY = jax.random.PRNGKey(3)


@gen
def joint():
    theta = gt.normal(0.5, 1.2) @ "theta"
    scale = gt.gamma(3.0, 2.0) @ "scale"
    y = gt.normal(theta * 2.0, jnp.sqrt(scale)) @ "y"
    return y


LATENTS = select("theta", "scale")
DATA = select("y")


def _moments(theta, scale, y):
    return jnp.stack([theta.mean(), (theta ** 2).mean(), scale.mean(),
                      y.mean(), (theta * y).mean()])


def _marginal_conditional(key, n):
    trs = jax.vmap(lambda k: joint.simulate(k, ()))(jax.random.split(key, n))
    return trs["theta"], trs["scale"], trs["y"]


def _successive_conditional(key, n_chains, n_steps, use_hmc):
    k_init, k_run = jax.random.split(key)
    traces = jax.vmap(lambda k: joint.simulate(k, ()))(
        jax.random.split(k_init, n_chains))

    def step(trs, sk):
        ks = jax.vmap(lambda i: jax.random.fold_in(sk, i))(
            jnp.arange(n_chains))

        def one(tr, k):
            k1, k2, k3 = jax.random.split(k, 3)
            if use_hmc:
                tr, _ = hmc(k1, tr, LATENTS, L=5, eps=0.15)
            else:
                new, w, _ = joint.regenerate(k1, tr, (), (), LATENTS)
                acc = jnp.log(jax.random.uniform(k3)) < w
                tr = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc, a, b), new, tr)
            # resample the data given the latents (weight is 0 by
            # construction — full conditional — but accept-step anyway
            # to catch weight errors)
            new, w, _ = joint.regenerate(k2, tr, (), (), DATA)
            return new, w

        trs, ws = jax.vmap(one)(trs, ks)
        return trs, (trs["theta"], trs["scale"], trs["y"], ws)

    _, (thetas, scales, ys, ws) = jax.lax.scan(
        step, traces, jax.random.split(k_run, n_steps))
    burn = n_steps // 3
    return (thetas[burn:].reshape(-1), scales[burn:].reshape(-1),
            ys[burn:].reshape(-1), ws)


def _compare(key, use_hmc):
    n = 200_000
    mc = _moments(*_marginal_conditional(jax.random.fold_in(key, 0), n))
    th, sc, y, ws = jax.jit(
        lambda k: _successive_conditional(k, 256, 400, use_hmc))(
            jax.random.fold_in(key, 1))
    scs = _moments(th, sc, y)
    # data-resampling regenerate weight must be exactly 0 (full conditional)
    np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-9)
    # moments agree within a loose MC band (autocorrelated chains)
    diff = np.abs(np.asarray(mc) - np.asarray(scs))
    tol = np.array([0.05, 0.12, 0.10, 0.12, 0.20])
    assert (diff < tol).all(), (np.asarray(mc), np.asarray(scs), diff)


def test_geweke_selection_mh():
    _compare(KEY, use_hmc=False)


def test_geweke_hmc():
    _compare(jax.random.fold_in(KEY, 7), use_hmc=True)
