"""Trainer convergence tests (reference: test/inference/variational.jl,
test/inference/train.jl, examples/bbvi.jl:30-79 — fit problems with known
posteriors and assert recovered parameters to tight tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, init_param, param
from gen_tpu.learning import (ADAM, FixedStepGradientDescent, GradientDescent,
                              ParamUpdate, black_box_vi, black_box_vimco,
                              reparam_vi, train)

KEY = jax.random.PRNGKey(0)

# model: mu ~ N(0,3); y ~ N(mu, 1) observed at 2.5
# posterior: N(2.25, 0.9^{1/2}...): var = 1/(1/9+1) = 0.9, mean = 0.9*2.5=2.25


@gen
def model():
    mu = gt.normal(0.0, 3.0) @ "mu"
    gt.normal(mu, 1.0) @ "y"


OBS = choicemap(y=2.5)
POST_MU, POST_STD = 2.25, np.sqrt(0.9)


def make_var_model():
    @gen
    def var_model():
        mu_loc = param("mu_loc")
        log_std = param("mu_log_std")
        gt.normal(mu_loc, jnp.exp(log_std)) @ "mu"

    init_param(var_model, "mu_loc", 0.0)
    init_param(var_model, "mu_log_std", 0.0)
    return var_model


def test_black_box_vi_recovers_posterior():
    var_model = make_var_model()
    update = ParamUpdate(FixedStepGradientDescent(0.01), var_model)
    elbo, _, hist = black_box_vi(
        KEY, model, (), OBS, var_model, (), update,
        iters=300, samples_per_iter=200)
    np.testing.assert_allclose(float(var_model.params["mu_loc"]), POST_MU,
                               atol=0.1)
    np.testing.assert_allclose(
        float(jnp.exp(var_model.params["mu_log_std"])), POST_STD, atol=0.1)
    # ELBO at optimum = log evidence
    exact_log_ml = float(gt.normal.logpdf(2.5, 0.0, np.sqrt(10.0)))
    assert abs(hist[-1] - exact_log_ml) < 0.25


def test_reparam_vi_recovers_posterior():
    var_model = make_var_model()
    update = ParamUpdate(ADAM(0.05), var_model)
    elbo, _, hist = reparam_vi(
        KEY, model, (), OBS, var_model, (), update,
        iters=200, samples_per_iter=64)
    np.testing.assert_allclose(float(var_model.params["mu_loc"]), POST_MU,
                               atol=0.05)
    np.testing.assert_allclose(
        float(jnp.exp(var_model.params["mu_log_std"])), POST_STD, atol=0.05)


def test_black_box_vimco():
    var_model = make_var_model()
    update = ParamUpdate(ADAM(0.05), var_model)
    est, _, _ = black_box_vimco(
        KEY, model, (), OBS, var_model, (), update, num_samples=20,
        iters=300, samples_per_iter=5)
    # the IWELBO optimum approaches the log evidence (q need not equal the
    # posterior exactly under the multi-sample bound)
    exact_log_ml = float(gt.normal.logpdf(2.5, 0.0, np.sqrt(10.0)))
    assert abs(est - exact_log_ml) < 0.15
    np.testing.assert_allclose(float(var_model.params["mu_loc"]), POST_MU,
                               atol=0.5)


def test_train_conditional_mle():
    """Train q(y|x) on data from p: recovers the conditional mean weights
    (reference pattern: test/inference/train.jl)."""
    @gen
    def q(x):
        w = param("w")
        b = param("b")
        gt.normal(w * x + b, 1.0) @ "y"

    init_param(q, "w", 0.0)
    init_param(q, "b", 0.0)

    def data_generator(key):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1)
        y = 2.0 * x + 1.0 + 0.1 * jax.random.normal(k2)
        return (x,), choicemap(y=y)

    update = ParamUpdate(ADAM(0.05), q)
    train(KEY, q, data_generator, update, num_epoch=5, epoch_size=200,
          num_minibatch=20, minibatch_size=32, evaluation_size=10)
    np.testing.assert_allclose(float(q.params["w"]), 2.0, atol=0.15)
    np.testing.assert_allclose(float(q.params["b"]), 1.0, atol=0.15)


def test_gradient_descent_decay_and_adam_state():
    @gen
    def pm():
        theta = param("theta")
        gt.normal(theta, 1.0) @ "x"

    init_param(pm, "theta", 0.0)
    update = ParamUpdate(GradientDescent(0.1, 100), pm)
    tr, _ = pm.generate(KEY, (), choicemap(x=1.0))
    pm.accumulate_param_gradients(tr)
    update.apply()
    # first step: step size = 0.1 * 101/101 = 0.1; grad = 1.0 - 0 = 1.0
    np.testing.assert_allclose(float(pm.params["theta"]), 0.1, rtol=1e-6)
    # accumulators zeroed
    assert pm.params_grad["theta"] is None
