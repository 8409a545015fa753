"""Laplace approximation: exact on Gaussian posteriors (mean, covariance,
AND evidence), accurate on a smooth non-Gaussian posterior (evidence checked
against brute-force quadrature), and dirac clamps addresses exactly."""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import laplace_approx, laplace_sample


def test_laplace_exact_on_conjugate_normal():
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model():
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    tr, _ = model.generate(jax.random.PRNGKey(0), (),
                           choicemap(ys=ys, mu=0.0))
    res = laplace_approx(tr, select("mu"))

    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    np.testing.assert_allclose(float(res.mean[0]), post_mean, atol=1e-5)
    np.testing.assert_allclose(float(res.cov[0, 0]), 1 / post_prec,
                               rtol=1e-5)
    # exact evidence: ys ~ N(0, sigma^2 I + prior_std^2 J)
    cov = sigma ** 2 * np.eye(n) + prior_std ** 2 * np.ones((n, n))
    y = np.asarray(ys)
    _, logdet = np.linalg.slogdet(cov)
    exact = (-0.5 * y @ np.linalg.solve(cov, y) - 0.5 * logdet
             - 0.5 * n * np.log(2 * np.pi))
    np.testing.assert_allclose(float(res.log_ml), exact, atol=1e-4)


def test_laplace_multivariate_regression():
    xs = jnp.linspace(-2, 2, 30)
    ys = 0.5 * xs - 1.0

    @gen
    def reg():
        s = gt.normal(0.0, 2.0) @ "s"
        b = gt.normal(0.0, 2.0) @ "b"
        gt.normal(s * xs + b, 0.3) @ "ys"

    tr, _ = reg.generate(jax.random.PRNGKey(0), (),
                         choicemap(ys=ys, s=0.0, b=0.0))
    res = laplace_approx(tr, select("s", "b"))
    # Gaussian posterior: mode == mean must recover truth to high accuracy
    got = {p: float(v) for p, v in
           zip(["b", "s"], np.asarray(res.mean))}  # to_array sorted order
    assert abs(got["s"] - 0.5) < 1e-3 and abs(got["b"] + 1.0) < 1e-3
    assert res.cov.shape == (2, 2)
    # samples from the Laplace Gaussian have the right mean
    samp = np.asarray(laplace_sample(jax.random.PRNGKey(1), res, 4000))
    np.testing.assert_allclose(samp.mean(axis=0), np.asarray(res.mean),
                               atol=4 * np.sqrt(np.diag(res.cov)).max()
                               / np.sqrt(4000) * 4 + 1e-3)


def test_laplace_evidence_vs_quadrature_non_gaussian():
    """mu ~ N(0,1), y ~ N(mu^3/3 + mu, 0.8): skewed posterior; Laplace
    evidence should be within ~0.1 nat of brute-force quadrature."""
    y_obs = 1.2

    @gen
    def model():
        mu = gt.normal(0.0, 1.0) @ "mu"
        gt.normal(mu ** 3 / 3.0 + mu, 0.8) @ "y"

    tr, _ = model.generate(jax.random.PRNGKey(0), (),
                           choicemap(y=y_obs, mu=0.5))
    res = laplace_approx(tr, select("mu"))

    grid = np.linspace(-6, 6, 20001)
    lp = (-0.5 * grid ** 2 - 0.5 * np.log(2 * np.pi)
          - 0.5 * ((y_obs - (grid ** 3 / 3 + grid)) / 0.8) ** 2
          - np.log(0.8) - 0.5 * np.log(2 * np.pi))
    exact = np.log(np.trapezoid(np.exp(lp), grid))
    assert abs(float(res.log_ml) - exact) < 0.1


def test_dirac_distribution():
    from gen_tpu import dirac
    assert float(dirac.logpdf(3, 3)) == 0.0
    assert float(dirac.logpdf(2, 3)) == -np.inf
    assert float(dirac.logpdf(1.5, 1.5)) == 0.0

    @gen
    def clamped():
        x = gt.dirac(4.0) @ "x"
        gt.normal(x, 1.0) @ "y"
        return x

    tr = clamped.simulate(jax.random.PRNGKey(0), ())
    assert float(tr["x"]) == 4.0
    w, _ = clamped.assess((), tr.get_choices())
    np.testing.assert_allclose(float(w), float(tr.get_score()), atol=1e-10)
    # constraining dirac to a mismatched value scores -inf
    tr2, w2 = clamped.generate(jax.random.PRNGKey(0), (),
                               choicemap(x=5.0, y=5.0))
    assert float(w2) == -np.inf
