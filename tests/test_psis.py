"""PSIS: k-hat recovers the analytic Pareto tail index of Gaussian
importance ratios (k = 1 - s^2 for proposal scale s), smoothing stabilizes
the estimator without biasing it, and the GPD fit recovers known shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from gen_tpu.inference import (psis, psis_effective_sample_size, gpd_fit)
from gen_tpu.utils import logsumexp


def gaussian_log_ratios(s, n, seed=0):
    """log[N(x; 0,1) / N(x; 0,s^2)] for x ~ N(0, s^2): analytic Pareto
    tail index k = 1 - s^2 (finite variance iff s^2 > 1/2 i.e. k < 1/2)."""
    x = np.random.default_rng(seed).normal(0, s, n)
    return jnp.asarray(-0.5 * x ** 2 + 0.5 * (x / s) ** 2 + np.log(s))


def test_khat_matches_analytic_tail_index():
    for s, tol in [(0.8, 0.1), (0.65, 0.12), (0.5, 0.15)]:
        ks = [float(psis(gaussian_log_ratios(s, 200_000, seed)).khat)
              for seed in range(3)]
        expected = 1 - s ** 2
        assert abs(np.mean(ks) - expected) < tol, (s, ks, expected)


def test_good_proposal_low_khat():
    # proposal wider than target: bounded ratios, khat < 0
    lw = gaussian_log_ratios(1.5, 50_000)
    res = psis(lw)
    assert float(res.khat) < 0.0


def test_exact_proposal_degenerate_tail():
    res = psis(jnp.zeros(1000))
    assert float(res.khat) == -np.inf
    np.testing.assert_array_equal(np.asarray(res.log_weights), 0.0)


def test_smoothing_stabilizes_without_bias():
    """Self-normalized IS estimate of E[x] under the target using smoothed
    vs raw weights: smoothing must not move the estimate by more than MC
    error, must reduce the max normalized weight, and must raise ESS."""
    s = 0.7
    rng = np.random.default_rng(3)
    x = rng.normal(0, s, 100_000)
    lw = jnp.asarray(-0.5 * x ** 2 + 0.5 * (x / s) ** 2)
    res = psis(lw)
    ln_raw = lw - logsumexp(lw)
    ln_sm = res.log_weights - logsumexp(res.log_weights)
    est_raw = float(jnp.sum(jnp.exp(ln_raw) * x))
    est_sm = float(jnp.sum(jnp.exp(ln_sm) * x))
    assert abs(est_sm - est_raw) < 0.05
    assert abs(est_sm) < 0.06   # true mean is 0
    # smoothed unnormalized weights are capped at the raw maximum
    assert float(jnp.max(res.log_weights)) <= float(jnp.max(lw)) + 1e-6
    # and the tail's weight mass shrinks (that is the stabilization)
    assert float(logsumexp(res.log_weights)) <= float(logsumexp(lw))
    # ESS is not degraded (equality up to redistribution noise when the
    # raw tail is already mild)
    assert float(psis_effective_sample_size(res.log_weights)) >= \
        0.95 * float(psis_effective_sample_size(lw))


def test_gpd_fit_recovers_known_shape():
    rng = np.random.default_rng(5)
    for k_true in [0.2, 0.5]:
        # inverse-CDF GPD draws, sigma = 1
        u = rng.uniform(size=80_000)
        draws = np.sort((np.power(1 - u, -k_true) - 1) / k_true)
        k_fit, sigma_fit = gpd_fit(jnp.asarray(draws))
        assert abs(float(k_fit) - k_true) < 0.05, (k_true, float(k_fit))
        assert abs(float(sigma_fit) - 1.0) < 0.1


def test_psis_jits():
    lw = gaussian_log_ratios(0.8, 20_000)
    a = jax.jit(lambda w: psis(w).khat)(lw)
    b = psis(lw).khat
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
