"""Unit tests for gen_tpu/inference/mass.py (dense + diag/low-rank
whitening metrics; engine-level integration lives in test_sample_api)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gen_tpu.inference.mass import (dense_mass_chol,
                                    lowrank_inverse_transform,
                                    lowrank_mass_factors,
                                    lowrank_transform,
                                    lowrank_whiten_logp, unwhiten, whiten,
                                    whiten_logp)


def _corr_population(d=6, n=50000, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = np.geomspace(1.0, 200.0, d)
    Sig = (Q * lam) @ Q.T
    X = rng.multivariate_normal(np.zeros(d), Sig, size=n)
    return jnp.asarray(X, jnp.float32), Sig


def test_dense_chol_recovers_covariance():
    X, Sig = _corr_population()
    L = dense_mass_chol(X)
    M = np.asarray(L, np.float64) @ np.asarray(L, np.float64).T
    # relative Frobenius error of the estimated covariance
    assert np.linalg.norm(M - Sig) / np.linalg.norm(Sig) < 0.05


def test_whiten_roundtrip_and_isotropy():
    X, _ = _corr_population()
    L = dense_mass_chol(X)
    Y = whiten(L, X)
    np.testing.assert_allclose(np.asarray(unwhiten(L, Y)), np.asarray(X),
                               rtol=1e-3, atol=1e-2)
    C = np.cov(np.asarray(Y, np.float64).T)
    assert np.abs(C - np.eye(C.shape[0])).max() < 0.05


def test_whiten_logp_gradient_chain_rule():
    X, _ = _corr_population(d=4)
    L = dense_mass_chol(X)

    def logp(x):
        return -0.5 * jnp.sum(x ** 2) + jnp.sum(jnp.sin(x))

    y = jnp.asarray([0.3, -0.2, 0.5, 0.1])
    g = jax.grad(whiten_logp(logp, L))(y)
    gx = jax.grad(logp)(L @ y)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(L).T @ np.asarray(gx), rtol=1e-5)


def test_lowrank_matches_dense_on_lowrank_covariance():
    """When the true covariance IS diag + rank-k, the low-rank metric
    whitens as well as the dense one."""
    d, k = 10, 2
    rng = np.random.default_rng(3)
    U = np.linalg.qr(rng.standard_normal((d, k)))[0]
    Sig = np.eye(d) + (U * [400.0, 100.0]) @ U.T
    X = jnp.asarray(rng.multivariate_normal(np.zeros(d), Sig, size=50000),
                    jnp.float32)
    f = lowrank_mass_factors(X, k)
    Y = lowrank_inverse_transform(*f, X)
    C = np.cov(np.asarray(Y, np.float64).T)
    assert np.abs(C - np.eye(d)).max() < 0.06
    # round trip
    np.testing.assert_allclose(
        np.asarray(lowrank_transform(*f, Y)), np.asarray(X),
        rtol=1e-3, atol=5e-2)


def test_lowrank_gradient_chain_rule():
    d, k = 6, 2
    X, _ = _corr_population(d=d)
    f = lowrank_mass_factors(X, k)

    def logp(x):
        return -0.5 * jnp.sum(x ** 2) + jnp.sum(jnp.cos(x))

    y = jnp.asarray(np.random.default_rng(0).standard_normal(d),
                    jnp.float32)
    g = jax.grad(lowrank_whiten_logp(logp, *f))(y)
    A = np.asarray(jax.vmap(
        lambda e: lowrank_transform(*f, e))(jnp.eye(d))).T
    gx = np.asarray(jax.grad(logp)(lowrank_transform(*f, y)), np.float64)
    np.testing.assert_allclose(np.asarray(g, np.float64), A.T @ gx,
                               rtol=1e-4, atol=1e-5)


def test_lowrank_rank_bounds():
    X, _ = _corr_population(d=4)
    with pytest.raises(ValueError, match="rank"):
        lowrank_mass_factors(X, 0)
    with pytest.raises(ValueError, match="rank"):
        lowrank_mass_factors(X, 4)
