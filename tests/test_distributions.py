"""Distribution tests: logpdf vs scipy and finite-difference checking of
logpdf_grad (reference: test/modeling_library/distributions.jl, 389 LoC,
with the finite_diff harness from test/runtests.jl:17-77)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gen_tpu as gt

KEY = jax.random.PRNGKey(0)
DX = 1e-6


def finite_diff(f, args, i, dx=DX):
    args_pos = list(args)
    args_neg = list(args)
    args_pos[i] = args[i] + dx
    args_neg[i] = args[i] - dx
    return (f(*args_pos) - f(*args_neg)) / (2 * dx)


def check_grads(dist, v, *args, skip=()):
    """Finite-diff every differentiable slot of logpdf_grad."""
    grads = dist.logpdf_grad(v, *args)
    f = lambda v_, *a: float(dist.logpdf(v_, *a))
    all_args = (v,) + args
    if dist.has_output_grad and 0 not in skip:
        fd = finite_diff(f, all_args, 0)
        np.testing.assert_allclose(grads[0], fd, rtol=1e-4, atol=1e-5)
    for j, has in enumerate(dist.arg_grads):
        if has and (j + 1) not in skip:
            fd = finite_diff(f, all_args, j + 1)
            np.testing.assert_allclose(grads[j + 1], fd, rtol=1e-4, atol=1e-5,
                                       err_msg=f"arg {j}")


# -- continuous -----------------------------------------------------------

def test_normal():
    lp = gt.normal.logpdf(1.2, 0.5, 2.0)
    np.testing.assert_allclose(lp, stats.norm.logpdf(1.2, 0.5, 2.0), rtol=1e-12)
    check_grads(gt.normal, 1.2, 0.5, 2.0)
    v = gt.normal.sample(KEY, 0.0, 1.0)
    assert jnp.shape(v) == ()


def test_broadcasted_normal():
    v = np.array([1.0, -0.5, 2.0])
    mu = np.array([0.0, 0.0, 1.0])
    lp = gt.broadcasted_normal.logpdf(v, mu, 1.0)
    np.testing.assert_allclose(lp, stats.norm.logpdf(v, mu, 1.0).sum(), rtol=1e-12)
    s = gt.broadcasted_normal.sample(KEY, jnp.zeros(3), jnp.ones(3))
    assert s.shape == (3,)


def test_normal_linear():
    rng = np.random.default_rng(3)
    n, p = 17, 3
    X = rng.standard_normal((n, p))
    beta = np.array([0.7, -0.4, 1.1])
    sigma = 0.8
    v = X @ beta + sigma * rng.standard_normal(n)
    lp = gt.normal_linear.logpdf(v, X, beta, sigma)
    # exactly the pointwise broadcasted-normal density
    np.testing.assert_allclose(
        lp, stats.norm.logpdf(v, X @ beta, sigma).sum(), rtol=1e-9)
    np.testing.assert_allclose(
        lp, gt.broadcasted_normal.logpdf(v, X @ beta, sigma), rtol=1e-12)
    # gradients wrt beta and sigma match the pointwise formulation
    g_gram = jax.grad(
        lambda b, s: gt.normal_linear.logpdf(v, X, b, s), argnums=(0, 1))(
            jnp.asarray(beta), jnp.asarray(sigma))
    g_point = jax.grad(
        lambda b, s: gt.broadcasted_normal.logpdf(v, X @ b, s),
        argnums=(0, 1))(jnp.asarray(beta), jnp.asarray(sigma))
    np.testing.assert_allclose(g_gram[0], g_point[0], rtol=1e-8)
    np.testing.assert_allclose(g_gram[1], g_point[1], rtol=1e-8)
    # sigma finite-difference (vector args checked via the grad match above)
    fd = finite_diff(lambda s_: float(gt.normal_linear.logpdf(v, X, beta, s_)),
                     (sigma,), 0)
    np.testing.assert_allclose(g_gram[1], fd, rtol=1e-4)
    s = gt.normal_linear.sample(KEY, X, jnp.asarray(beta), sigma)
    assert s.shape == (n,)
    # in-model use: generate weight = the constrained logpdf
    @gt.gen
    def m(X):
        b = gt.mvnormal(jnp.zeros(p), jnp.eye(p)) @ "b"
        gt.normal_linear(X, b, 0.8) @ "ys"

    tr, w = m.generate(KEY, (jnp.asarray(X),), gt.choicemap(
        b=jnp.asarray(beta), ys=jnp.asarray(v)))
    np.testing.assert_allclose(
        w,
        gt.mvnormal.logpdf(beta, jnp.zeros(p), jnp.eye(p))
        + gt.normal_linear.logpdf(v, X, beta, sigma), rtol=1e-9)


def test_mvnormal():
    mu = np.array([1.0, -1.0])
    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    v = np.array([0.5, 0.5])
    lp = gt.mvnormal.logpdf(v, mu, cov)
    np.testing.assert_allclose(lp, stats.multivariate_normal.logpdf(v, mu, cov),
                               rtol=1e-10)
    s = gt.mvnormal.sample(KEY, jnp.asarray(mu), jnp.asarray(cov))
    assert s.shape == (2,)
    # gradient w.r.t. value
    g = jax.grad(lambda x: gt.mvnormal.logpdf(x, mu, cov))(jnp.asarray(v))
    fd0 = (gt.mvnormal.logpdf(v + np.array([DX, 0]), mu, cov)
           - gt.mvnormal.logpdf(v - np.array([DX, 0]), mu, cov)) / (2 * DX)
    np.testing.assert_allclose(g[0], fd0, rtol=1e-4)


def test_uniform():
    lp = gt.uniform.logpdf(0.3, -1.0, 2.0)
    np.testing.assert_allclose(lp, -np.log(3.0), rtol=1e-12)
    assert gt.uniform.logpdf(3.0, -1.0, 2.0) == -np.inf
    check_grads(gt.uniform, 0.3, -1.0, 2.0)
    s = gt.uniform.sample(KEY, -1.0, 2.0)
    assert -1.0 <= float(s) <= 2.0


def test_beta():
    lp = gt.beta.logpdf(0.3, 2.0, 3.0)
    np.testing.assert_allclose(lp, stats.beta.logpdf(0.3, 2.0, 3.0), rtol=1e-10)
    assert gt.beta.logpdf(-0.1, 2.0, 3.0) == -np.inf
    check_grads(gt.beta, 0.3, 2.0, 3.0)


def test_beta_uniform():
    theta, a, b = 0.4, 2.0, 3.0
    x = 0.3
    expected = np.logaddexp(np.log(theta) + stats.beta.logpdf(x, a, b),
                            np.log(1 - theta))
    np.testing.assert_allclose(gt.beta_uniform.logpdf(x, theta, a, b),
                               expected, rtol=1e-10)
    check_grads(gt.beta_uniform, x, theta, a, b)


def test_gamma():
    lp = gt.gamma.logpdf(2.5, 2.0, 3.0)  # shape, scale
    np.testing.assert_allclose(lp, stats.gamma.logpdf(2.5, 2.0, scale=3.0),
                               rtol=1e-10)
    assert gt.gamma.logpdf(-1.0, 2.0, 3.0) == -np.inf
    check_grads(gt.gamma, 2.5, 2.0, 3.0)


def test_inv_gamma():
    lp = gt.inv_gamma.logpdf(0.5, 2.0, 3.0)
    np.testing.assert_allclose(lp, stats.invgamma.logpdf(0.5, 2.0, scale=3.0),
                               rtol=1e-10)
    check_grads(gt.inv_gamma, 0.5, 2.0, 3.0)


def test_exponential():
    lp = gt.exponential.logpdf(1.5, 2.0)
    np.testing.assert_allclose(lp, stats.expon.logpdf(1.5, scale=0.5), rtol=1e-10)
    assert gt.exponential.logpdf(-0.5, 2.0) == -np.inf
    check_grads(gt.exponential, 1.5, 2.0)


def test_cauchy():
    lp = gt.cauchy.logpdf(1.5, 0.5, 2.0)
    np.testing.assert_allclose(lp, stats.cauchy.logpdf(1.5, 0.5, 2.0), rtol=1e-10)
    check_grads(gt.cauchy, 1.5, 0.5, 2.0)


def test_laplace():
    lp = gt.laplace.logpdf(1.5, 0.5, 2.0)
    np.testing.assert_allclose(lp, stats.laplace.logpdf(1.5, 0.5, 2.0), rtol=1e-10)
    check_grads(gt.laplace, 1.5, 0.5, 2.0)


def test_piecewise_uniform():
    bounds = jnp.array([0.0, 1.0, 3.0])
    probs = jnp.array([0.6, 0.4])
    np.testing.assert_allclose(gt.piecewise_uniform.logpdf(0.5, bounds, probs),
                               np.log(0.6), rtol=1e-10)
    np.testing.assert_allclose(gt.piecewise_uniform.logpdf(2.0, bounds, probs),
                               np.log(0.4 / 2.0), rtol=1e-10)
    assert gt.piecewise_uniform.logpdf(4.0, bounds, probs) == -np.inf
    s = gt.piecewise_uniform.sample(KEY, bounds, probs)
    assert 0.0 <= float(s) <= 3.0


# -- discrete -------------------------------------------------------------

def test_bernoulli():
    np.testing.assert_allclose(gt.bernoulli.logpdf(True, 0.3), np.log(0.3),
                               rtol=1e-10)
    np.testing.assert_allclose(gt.bernoulli.logpdf(False, 0.3), np.log(0.7),
                               rtol=1e-10)
    g = gt.bernoulli.logpdf_grad(True, 0.3)
    assert g[0] is None
    np.testing.assert_allclose(g[1], 1 / 0.3, rtol=1e-6)


def test_categorical():
    probs = jnp.array([0.2, 0.3, 0.5])
    np.testing.assert_allclose(gt.categorical.logpdf(2, probs), np.log(0.5),
                               rtol=1e-10)
    s = gt.categorical.sample(KEY, probs)
    assert 0 <= int(s) <= 2
    # grad w.r.t. probs
    g = gt.categorical.logpdf_grad(1, probs)[1]
    np.testing.assert_allclose(g, [0.0, 1 / 0.3, 0.0], atol=1e-8)


def test_uniform_discrete():
    np.testing.assert_allclose(gt.uniform_discrete.logpdf(3, 1, 5),
                               -np.log(5.0), rtol=1e-10)
    assert gt.uniform_discrete.logpdf(6, 1, 5) == -np.inf
    s = gt.uniform_discrete.sample(KEY, 1, 5)
    assert 1 <= int(s) <= 5


def test_poisson():
    np.testing.assert_allclose(gt.poisson.logpdf(3, 2.5),
                               stats.poisson.logpmf(3, 2.5), rtol=1e-10)
    g = gt.poisson.logpdf_grad(3, 2.5)[1]
    np.testing.assert_allclose(g, 3 / 2.5 - 1, rtol=1e-6)


def test_binom():
    np.testing.assert_allclose(gt.binom.logpdf(3, 10, 0.4),
                               stats.binom.logpmf(3, 10, 0.4), rtol=1e-10)
    s = gt.binom.sample(KEY, 10, 0.4)
    assert 0 <= int(s) <= 10


def test_geometric():
    np.testing.assert_allclose(gt.geometric.logpdf(4, 0.3),
                               stats.geom.logpmf(5, 0.3), rtol=1e-10)
    # reference convention: failures before success (support from 0)
    np.testing.assert_allclose(gt.geometric.logpdf(0, 0.3), np.log(0.3),
                               rtol=1e-10)
    g = gt.geometric.logpdf_grad(4, 0.3)[1]
    np.testing.assert_allclose(g, 1 / 0.3 - 4 / 0.7, rtol=1e-6)


def test_neg_binom():
    np.testing.assert_allclose(gt.neg_binom.logpdf(4, 3.0, 0.4),
                               stats.nbinom.logpmf(4, 3.0, 0.4), rtol=1e-10)


def test_sampling_statistics():
    """Sampled moments match analytic moments (smoke-level)."""
    n = 20000
    keys = jax.random.split(KEY, n)
    x = jax.vmap(lambda k: gt.gamma.sample(k, 3.0, 2.0))(keys)
    np.testing.assert_allclose(jnp.mean(x), 6.0, rtol=0.05)
    b = jax.vmap(lambda k: gt.bernoulli.sample(k, 0.3))(keys)
    np.testing.assert_allclose(jnp.mean(b), 0.3, atol=0.02)
    g = jax.vmap(lambda k: gt.geometric.sample(k, 0.25))(keys)
    np.testing.assert_allclose(jnp.mean(g), 3.0, rtol=0.06)
    p = jax.vmap(lambda k: gt.poisson.sample(k, 4.0))(keys)
    np.testing.assert_allclose(jnp.mean(p), 4.0, rtol=0.05)
    nb = jax.vmap(lambda k: gt.neg_binom.sample(k, 3.0, 0.4))(keys)
    np.testing.assert_allclose(jnp.mean(nb), 3.0 * 0.6 / 0.4, rtol=0.06)


def test_student_t():
    lp = gt.student_t.logpdf(1.3, 4.0, 0.5, 2.0)
    np.testing.assert_allclose(lp, stats.t.logpdf(1.3, 4.0, 0.5, 2.0),
                               rtol=1e-6)
    check_grads(gt.student_t, 1.3, 4.0, 0.5, 2.0)
    v = gt.student_t.sample(KEY, 4.0, 0.5, 2.0)
    assert jnp.shape(v) == ()
    # statistical: sample variance -> nu/(nu-2) * scale^2
    s = gt.student_t.sample(KEY, 6.0, jnp.zeros(200_000), 1.0)
    np.testing.assert_allclose(np.var(np.asarray(s)), 6.0 / 4.0, rtol=0.05)


def test_dirichlet():
    alpha = np.array([2.0, 3.0, 1.5])
    v = np.array([0.3, 0.5, 0.2])
    lp = gt.dirichlet.logpdf(v, alpha)
    np.testing.assert_allclose(lp, stats.dirichlet.logpdf(v, alpha),
                               rtol=1e-6)
    s = gt.dirichlet.sample(KEY, jnp.asarray(alpha))
    np.testing.assert_allclose(float(jnp.sum(s)), 1.0, atol=1e-6)
    # sample mean matches alpha / sum(alpha)
    keys = jax.random.split(KEY, 50_000)
    ss = jax.vmap(lambda k: gt.dirichlet.sample(k, jnp.asarray(alpha)))(keys)
    np.testing.assert_allclose(np.asarray(ss).mean(0), alpha / alpha.sum(),
                               atol=0.01)
    # gradient w.r.t. alpha by finite differences (vector arg: check via
    # directional derivative)
    d = np.array([0.3, -0.2, 0.1])
    g = gt.dirichlet.logpdf_grad(v, alpha)[1]
    f = lambda a: float(gt.dirichlet.logpdf(v, a))
    fd = (f(alpha + 1e-6 * d) - f(alpha - 1e-6 * d)) / 2e-6
    np.testing.assert_allclose(float(np.dot(np.asarray(g), d)), fd,
                               rtol=1e-4)


def test_dirichlet_in_model():
    from gen_tpu import choicemap, gen

    @gen
    def mix():
        w = gt.dirichlet(jnp.asarray([1.0, 1.0, 1.0])) @ "w"
        gt.categorical(w) @ "z"
        return w

    tr = mix.simulate(KEY, ())
    w, _ = mix.assess((), tr.get_choices())
    np.testing.assert_allclose(float(w), float(tr.get_score()), atol=1e-6)


def test_multinomial():
    n, probs = 12, np.array([0.2, 0.5, 0.3])
    v = np.array([3, 6, 3])
    lp = gt.multinomial.logpdf(v, n, probs)
    np.testing.assert_allclose(lp, stats.multinomial.logpmf(v, n, probs),
                               rtol=1e-6)
    assert float(gt.multinomial.logpdf(np.array([3, 6, 2]), n, probs)) \
        == -np.inf  # counts must sum to n
    s = gt.multinomial.sample(KEY, n, jnp.asarray(probs))
    assert float(jnp.sum(s)) == n
    ss = jax.vmap(lambda k: gt.multinomial.sample(k, n, jnp.asarray(probs)))(
        jax.random.split(KEY, 20000))
    np.testing.assert_allclose(np.asarray(ss).mean(0), n * probs, atol=0.1)
    # directional gradient in probs
    d = np.array([0.05, -0.03, -0.02])
    g = gt.multinomial.logpdf_grad(v, n, probs)[2]
    f = lambda p: float(gt.multinomial.logpdf(v, n, p))
    fd = (f(probs + 1e-6 * d) - f(probs - 1e-6 * d)) / 2e-6
    np.testing.assert_allclose(float(np.dot(np.asarray(g), d)), fd,
                               rtol=1e-4)


def test_piecewise_poisson_process():
    """Density matches the reference formula (poisson_process.jl:34-53):
    sum log rate(seg) - integral, half-open (b, b'] segments, -inf outside
    bounds or non-ascending bounds; padded +inf entries are ignored."""
    import gen_tpu as gt
    bounds = jnp.array([0.0, 2.0, 5.0, 10.0])
    rates = jnp.array([0.5, 2.0, 1.0])
    x = jnp.array([1.0, 2.0, 3.0, 9.0])
    expect = (np.log(0.5) + np.log(0.5) + np.log(2.0) + np.log(1.0)
              - (0.5 * 2 + 2 * 3 + 1 * 5))
    got = float(gt.piecewise_poisson_process.logpdf(x, bounds, rates))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    xp = jnp.concatenate([x, jnp.full(3, jnp.inf)])
    np.testing.assert_allclose(
        float(gt.piecewise_poisson_process.logpdf(xp, bounds, rates)),
        expect, rtol=1e-6)
    assert float(gt.piecewise_poisson_process.logpdf(
        jnp.array([11.0]), bounds, rates)) == -np.inf
    assert float(gt.piecewise_poisson_process.logpdf(
        x, bounds[::-1], rates)) == -np.inf
    # padded simulation: count and segment-occupancy moments
    d = gt.PiecewisePoissonProcess(max_events=64)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samps = jax.vmap(lambda k: d.sample(k, bounds, rates))(keys)
    finite = jnp.isfinite(samps)
    np.testing.assert_allclose(float(jnp.sum(finite, axis=1).mean()), 12.0,
                               atol=0.3)
    frac = float(jnp.sum(finite & (samps > 2.0) & (samps <= 5.0))
                 / jnp.sum(finite))
    np.testing.assert_allclose(frac, 0.5, atol=0.02)
