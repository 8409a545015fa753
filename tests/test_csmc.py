"""Conditional SMC / Particle Gibbs: lane-0 pinning is exact, weights are
GFI-exact (hand-computed), and the PG chain targets the exact posterior
(checked against the Kalman smoother — the reference's PF test strategy of
comparing to a closed-form oracle, test/inference/particle_filter.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import gen
from gen_tpu.combinators.vector import VectorChoiceMap
from gen_tpu.inference import (csmc_genealogy, particle_gibbs,
                               particle_gibbs_step,
                               check_state_is_choice_determined,
                               reconstruct_trajectories, smc_genealogy)
from gen_tpu.models import LGSSMParams, kalman_smoother
from gen_tpu.utils import logsumexp

A, Q, C, R = 0.9, 0.3, 1.0, 0.4
MU0, P0 = 0.0, 1.0


@gen
def ssm_kernel(t, prev_x):
    first = t == 0
    mean = jnp.where(first, MU0, A * prev_x)
    var = jnp.where(first, P0, Q)
    x = gt.normal(mean, jnp.sqrt(var)) @ "x"
    gt.normal(C * x, jnp.sqrt(R)) @ "y"
    return x


def make_data(T, seed=3):
    rng = np.random.default_rng(seed)
    xs = np.zeros(T)
    xs[0] = rng.normal(MU0, np.sqrt(P0))
    for t in range(1, T):
        xs[t] = rng.normal(A * xs[t - 1], np.sqrt(Q))
    ys = rng.normal(C * xs, np.sqrt(R))
    return jnp.asarray(ys)


def obs_map(ys):
    return VectorChoiceMap(gt.ChoiceMap().set_value("y", ys), ys.shape[0])


def ref_map(xs, ys):
    inner = gt.ChoiceMap().set_value("x", xs).set_value("y", ys)
    return VectorChoiceMap(inner, ys.shape[0])


def kalman_params():
    return LGSSMParams(
        A=jnp.asarray([[A]]), Q=jnp.asarray([[Q]]),
        C=jnp.asarray([[C]]), R=jnp.asarray([[R]]),
        mu0=jnp.asarray([MU0]), P0=jnp.asarray([[P0]]))


def test_reference_lane_is_pinned_exactly():
    T, n = 12, 32
    ys = make_data(T)
    ref_xs = jnp.asarray(np.random.default_rng(1).standard_normal(T))
    subs, anc, log_w, _ = csmc_genealogy(
        jax.random.PRNGKey(0), ssm_kernel, 0.0, (), obs_map(ys),
        ref_map(ref_xs, ys), n)
    trajs = reconstruct_trajectories(subs, anc)
    got = trajs.get_choices().get_value("x")  # (T, n)
    # without ancestor sampling lane 0's ancestor is always lane 0, so
    # trajectory 0 must be the reference bit-for-bit
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(ref_xs))
    np.testing.assert_array_equal(np.asarray(anc[:, 0]), 0)


def test_lane_weights_are_observation_densities():
    """One step (T=1): every lane's weight — including the pinned one —
    must be exactly logpdf(y | C x, R) for its own x."""
    T, n = 1, 16
    ys = make_data(T)
    ref_xs = jnp.asarray([0.37])
    subs, _, log_w, lml = csmc_genealogy(
        jax.random.PRNGKey(2), ssm_kernel, 0.0, (), obs_map(ys),
        ref_map(ref_xs, ys), n)
    xs = np.asarray(subs.get_choices().get_value("x"))[0]  # (n,)
    expected = -0.5 * (np.asarray(ys[0]) - C * xs) ** 2 / R \
        - 0.5 * np.log(2 * np.pi * R)
    np.testing.assert_allclose(np.asarray(log_w), expected, rtol=0,
                               atol=1e-5)
    assert abs(xs[0] - 0.37) < 1e-7
    # log-ML estimate is the weight logsumexp - log n
    np.testing.assert_allclose(float(lml),
                               float(logsumexp(jnp.asarray(expected))
                                     - jnp.log(n)), atol=1e-5)


def test_single_particle_csmc_is_identity():
    T = 8
    ys = make_data(T)
    ref_xs = jnp.asarray(np.random.default_rng(5).standard_normal(T))
    new_ref, _ = particle_gibbs_step(
        jax.random.PRNGKey(1), ssm_kernel, 0.0, (), obs_map(ys),
        ref_map(ref_xs, ys), num_particles=1, ancestor_sampling=False)
    np.testing.assert_array_equal(np.asarray(new_ref.inner.get_value("x")),
                                  np.asarray(ref_xs))


def test_ancestor_sampling_validator():
    assert check_state_is_choice_determined(
        jax.random.PRNGKey(0), ssm_kernel,
        jnp.linspace(-2.0, 2.0, 8), 1, (),
        gt.choicemap(x=0.5, y=0.1))

    @gen
    def noise_kernel(t, prev):
        eps = gt.normal(0.0, 1.0) @ "eps"
        gt.normal(prev + eps, 0.5) @ "y"
        return prev + eps

    assert not check_state_is_choice_determined(
        jax.random.PRNGKey(0), noise_kernel,
        jnp.linspace(-2.0, 2.0, 8), 1, (),
        gt.choicemap(eps=0.5, y=0.1))


def test_ancestor_sampling_rewires_genealogy():
    """With AS on, lane 0's ancestor is drawn from the weighted particles:
    over a long run it must not always stay 0."""
    T, n = 24, 64
    ys = make_data(T)
    ref_xs = jnp.zeros(T)
    _, anc, _, _ = csmc_genealogy(
        jax.random.PRNGKey(4), ssm_kernel, 0.0, (), obs_map(ys),
        ref_map(ref_xs, ys), n, ancestor_sampling=True)
    assert int(np.sum(np.asarray(anc[:, 0]) != 0)) > 0


@pytest.mark.parametrize("ancestor_sampling", [False, True])
def test_particle_gibbs_matches_kalman_smoother(ancestor_sampling):
    """The PG chain's stationary distribution is the exact smoothing
    posterior: sweep-averaged states must match the RTS smoother means
    within Monte-Carlo error."""
    T, n, sweeps, burn = 10, 64, 400, 50
    ys = make_data(T, seed=11)
    refs, _ = jax.jit(lambda k: particle_gibbs(
        k, ssm_kernel, 0.0, (), obs_map(ys), num_particles=n,
        num_sweeps=sweeps, ancestor_sampling=ancestor_sampling))(
            jax.random.PRNGKey(8))
    xs = np.asarray(refs.inner.get_value("x"))  # (sweeps, T)
    post_mean = xs[burn:].mean(axis=0)
    post_var = xs[burn:].var(axis=0)

    sm_means, sm_covs = kalman_smoother(kalman_params(), ys[:, None])
    sm_means = np.asarray(sm_means)[:, 0]
    sm_vars = np.asarray(sm_covs)[:, 0, 0]
    se = np.sqrt(sm_vars / (sweeps - burn)) * 6 + 0.05
    np.testing.assert_allclose(post_mean, sm_means, atol=float(se.max()))
    np.testing.assert_allclose(post_var, sm_vars, rtol=0.45, atol=0.05)


def test_csmc_log_ml_close_to_kalman():
    from gen_tpu.models import kalman_filter
    T, n = 16, 512
    ys = make_data(T, seed=13)
    ref_xs = jnp.zeros(T)
    lmls = []
    for s in range(6):
        _, _, _, lml = csmc_genealogy(
            jax.random.PRNGKey(s), ssm_kernel, 0.0, (), obs_map(ys),
            ref_map(ref_xs, ys), n, ancestor_sampling=True)
        lmls.append(float(lml))
    exact = float(kalman_filter(kalman_params(), ys[:, None]).log_ml)
    assert abs(np.mean(lmls) - exact) < 0.35


def test_adaptive_resampling_keeps_pin():
    T, n = 12, 32
    ys = make_data(T)
    ref_xs = jnp.asarray(np.random.default_rng(9).standard_normal(T))
    subs, anc, _, _ = csmc_genealogy(
        jax.random.PRNGKey(3), ssm_kernel, 0.0, (), obs_map(ys),
        ref_map(ref_xs, ys), n, ess_threshold=n / 2)
    trajs = reconstruct_trajectories(subs, anc)
    got = trajs.get_choices().get_value("x")
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(ref_xs))


def test_conditional_multinomial_parents_are_iid():
    """Regression (review finding): the non-reference parents must be iid
    Categorical(w). The old implementation drew n sorted parents and
    overwrote index 0 — discarding the MINIMUM, so parent index 0 appeared
    with frequency w0^2-ish instead of w0 (measured 0.106 vs 0.25 at n=4
    uniform), suppressing the previous reference particle's offspring."""
    from gen_tpu.inference.csmc import _conditional_multinomial_parents
    n, trials = 4, 20000
    lnw = jnp.zeros(n) - jnp.log(n)  # uniform
    draws = jax.vmap(lambda k: _conditional_multinomial_parents(k, lnw))(
        jax.random.split(jax.random.PRNGKey(0), trials))
    freq = np.bincount(np.asarray(draws).ravel(), minlength=n) / draws.size
    se = np.sqrt(0.25 * 0.75 / draws.size)
    np.testing.assert_allclose(freq, 0.25, atol=5 * se + 1e-3)
