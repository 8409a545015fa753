"""Predictive sampling: posterior predictive moments match the conjugate
closed forms, new-args prediction works by address, prior predictive
matches the marginal."""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen
from gen_tpu.inference import (posterior_predictive, prior_predictive,
                               sample_posterior)

N_OBS, SIGMA, PRIOR_STD = 20, 1.0, 3.0
YS = jnp.full(N_OBS, 2.0)


@gen
def model(n):
    mu = gt.normal(0.0, PRIOR_STD) @ "mu"
    gt.normal(mu * jnp.ones(n), SIGMA) @ "ys"


def conjugate():
    prec = 1 / PRIOR_STD ** 2 + N_OBS / SIGMA ** 2
    return (float(YS.sum()) / SIGMA ** 2) / prec, 1 / prec


def test_posterior_predictive_moments():
    out = sample_posterior(jax.random.PRNGKey(0), model, (N_OBS,),
                           choicemap(ys=YS), num_chains=4, num_warmup=200,
                           num_samples=500, summarize=False)
    pred = posterior_predictive(jax.random.PRNGKey(1), model, (1,),
                                {"mu": out.samples["mu"]})
    ys_new = np.asarray(pred.get_value("ys"))   # (draws, 1)
    post_mean, post_var = conjugate()
    n = ys_new.shape[0]
    assert n == 2000
    se = np.sqrt((post_var + SIGMA ** 2) / n)
    assert abs(ys_new.mean() - post_mean) < 5 * se
    np.testing.assert_allclose(ys_new.var(), post_var + SIGMA ** 2,
                               rtol=0.12)
    # the constrained latents are echoed back with the draw axis
    assert pred.get_value("mu").shape == (n,)


def test_posterior_predictive_subsample_and_new_args():
    mus = jnp.linspace(-1.0, 1.0, 100)[:, None]  # fake (draws, chains=1)
    pred = posterior_predictive(jax.random.PRNGKey(2), model, (7,),
                                {"mu": mus}, num_draws=50)
    assert pred.get_value("ys").shape == (50, 7)


def test_prior_predictive():
    pred = prior_predictive(jax.random.PRNGKey(3), model, (N_OBS,), 4000)
    ys = np.asarray(pred.get_value("ys"))
    assert ys.shape == (4000, N_OBS)
    # marginal variance of y = prior_std^2 + sigma^2
    np.testing.assert_allclose(ys.var(), PRIOR_STD ** 2 + SIGMA ** 2,
                               rtol=0.1)
