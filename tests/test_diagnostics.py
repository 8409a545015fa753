"""Diagnostics: R-hat ~ 1 and ESS ~ N*M for iid draws, AR(1) ESS matches
the analytic integrated autocorrelation time, mean/scale-mismatched chains
are flagged, and summarize handles pytrees with event dims."""

import jax
import jax.numpy as jnp
import numpy as np

from gen_tpu.diagnostics import (ess_bulk, ess_mean, ess_tail, mcse_mean,
                                 rhat, summarize)


def iid_draws(n=1000, m=4, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((n, m)))


def ar1_draws(phi, n=20000, m=4, seed=1):
    rng = np.random.default_rng(seed)
    eps = rng.standard_normal((n, m)) * np.sqrt(1 - phi ** 2)
    x = np.zeros((n, m))
    x[0] = rng.standard_normal(m)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t]
    return jnp.asarray(x)


def test_iid_chains_pass():
    x = iid_draws()
    assert float(rhat(x)) < 1.01
    nm = x.shape[0] * x.shape[1]
    assert 0.7 * nm < float(ess_bulk(x)) < 1.5 * nm
    assert 0.5 * nm < float(ess_tail(x)) < 1.6 * nm
    # MCSE of the mean ~ 1/sqrt(NM) for unit-variance draws
    assert abs(float(mcse_mean(x)) - 1 / np.sqrt(nm)) < 0.5 / np.sqrt(nm)


def test_ar1_ess_matches_analytic():
    phi = 0.9
    x = ar1_draws(phi)
    nm = x.shape[0] * x.shape[1]
    expected = nm * (1 - phi) / (1 + phi)
    got = float(ess_mean(x))
    assert 0.6 * expected < got < 1.6 * expected
    assert float(rhat(x)) < 1.02


def test_mean_shifted_chain_flagged():
    x = np.asarray(iid_draws(seed=2)).copy()
    x[:, 0] += 1.5
    assert float(rhat(jnp.asarray(x))) > 1.05


def test_scale_mismatched_chain_flagged_by_folding():
    x = np.asarray(iid_draws(seed=3)).copy()
    x[:, 0] *= 4.0  # same mean, wrong scale — folded R-hat catches it
    assert float(rhat(jnp.asarray(x))) > 1.05


def test_rank_normalization_is_distribution_free():
    """Heavy-tailed draws (Cauchy, no moments) still give R-hat ~ 1 and a
    sane bulk ESS — the point of rank normalization."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_cauchy((1000, 4)))
    assert float(rhat(x)) < 1.01
    assert float(ess_bulk(x)) > 2000


def test_summarize_pytree_event_dims():
    samples = {
        "mu": iid_draws(500, 4, seed=5),
        "beta": jnp.asarray(
            np.random.default_rng(6).standard_normal((500, 4, 3))),
    }
    out = summarize(samples)
    (mu_key,) = [k for k in out if "mu" in k]
    (beta_key,) = [k for k in out if "beta" in k]
    assert out[mu_key]["rhat"].shape == ()
    assert out[beta_key]["ess_bulk"].shape == (3,)
    for stats in out.values():
        for v in stats.values():
            assert np.all(np.isfinite(np.asarray(v)))


def test_diagnostics_jit():
    x = iid_draws(400, 4, seed=7)
    a = float(jax.jit(rhat)(x))
    b = float(rhat(x))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_rhat_large_pooled_size_no_overflow():
    """Regression (round 5): the naive rank->normal-score division
    computed p == 1.0 exactly in f32 once the pooled size passed ~2^23
    (ndtri(1) = inf -> every statistic NaN — and a max-against-0 gate
    SILENTLY passed the NaN). The tail-safe symmetric form must stay
    finite and ~1 on iid draws at 6000 x 2048."""
    rng = np.random.default_rng(0)
    dr = jnp.asarray(rng.standard_normal((6000, 2048)), jnp.float32)
    r = float(rhat(dr))
    assert np.isfinite(r), r
    assert abs(r - 1.0) < 0.01, r
    e = float(ess_bulk(dr))
    assert np.isfinite(e) and e > 1e6, e
