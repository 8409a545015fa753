"""One-call inference on mixed discrete+continuous models (VERDICT r4
item 1): sample_posterior alternates exact enumerative Gibbs over the
discrete addresses with NUTS over the continuous block
(gen_tpu/inference/mixed.py). Reference semantics: uniform selection
moves over any address type (/root/reference/src/inference/mh.jl:15-29)
and the flagship regression's interleaved discrete/continuous loop
(/root/reference/examples/regression/static_mh.jl:28-38,60-70)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import Map, gen, vector_choicemap
from gen_tpu.inference import enumerate_marginals
from gen_tpu.inference.mixed import discover_discrete_sites
from gen_tpu.inference.sample import sample_posterior

sigma, tau = 1.0, 1.5
PRIOR_LOCS = (-2.0, 2.0)     # asymmetric priors break the label symmetry,
                             # so the posterior is unimodal and cross-chain
                             # moments are a tight gate


@gen
def _gmm_datum(mu0, mu1):
    z = gt.bernoulli(0.5) @ "z"
    y = gt.normal(jnp.where(z, mu1, mu0), sigma) @ "y"
    return y


_gmm_data = Map(_gmm_datum)


@gen
def gmm_model(n):
    mu0 = gt.normal(PRIOR_LOCS[0], tau) @ "mu0"
    mu1 = gt.normal(PRIOR_LOCS[1], tau) @ "mu1"
    return _gmm_data(jnp.full(n, mu0), jnp.full(n, mu1)) @ "data"


def _gmm_exact_moments(ys):
    """Exact posterior mean/var of mu0 (and P(z_i=1)) by enumeration over
    all 2^N assignments with conjugate per-cluster evidence:
    1/v_k = 1/tau^2 + n_k/sigma^2, m_k = v_k (m0_k/tau^2 + sum_y/sigma^2);
    varying part of the log evidence = 0.5 log(v_k/tau^2)
    + 0.5 m_k^2/v_k (the -0.5 m0_k^2/tau^2 and per-point terms are
    constant across assignments)."""
    y_np = np.asarray(ys, np.float64)
    N = len(y_np)
    logws, m0s, v0s, zs = [], [], [], []
    for z in itertools.product([0, 1], repeat=N):
        z = np.asarray(z)
        lw, ms, vs = 0.0, [], []
        for k in (0, 1):
            yk = y_np[z == k]
            vk = 1.0 / (1.0 / tau ** 2 + len(yk) / sigma ** 2)
            mk = vk * (PRIOR_LOCS[k] / tau ** 2 + yk.sum() / sigma ** 2)
            lw += 0.5 * np.log(vk / tau ** 2) + 0.5 * mk ** 2 / vk
            ms.append(mk)
            vs.append(vk)
        logws.append(lw)
        m0s.append(ms[0])
        v0s.append(vs[0])
        zs.append(z)
    w = np.exp(np.asarray(logws) - max(logws))
    w /= w.sum()
    mean = float(w @ np.asarray(m0s))
    var = float(w @ (np.asarray(v0s) + np.asarray(m0s) ** 2) - mean ** 2)
    pz = w @ np.asarray(zs, np.float64)
    return mean, var, pz


def test_gmm_one_call_matches_exact_enumeration():
    """The GMM runs through sample_posterior with NO manual composition;
    cross-chain moments of mu0 match exact enumeration over all 2^N
    assignment vectors."""
    ys = jnp.asarray([-2.3, -1.8, -0.4, 0.6, 2.2, 1.9], jnp.float32)
    N = int(ys.shape[0])
    ex_mean, ex_var, ex_pz = _gmm_exact_moments(ys)

    obs = gt.ChoiceMap()
    obs.set_submap("data", vector_choicemap(N, y=ys))
    res = sample_posterior(jax.random.PRNGKey(0), gmm_model, (N,), obs,
                           num_chains=128, num_warmup=80, num_samples=80,
                           max_depth=6)
    assert res.info["engine"] == "gibbs_nuts"
    assert res.info["discrete_sites"] == [("data", "z")]
    assert res.info["discrete_evals_per_sweep"] == 2 * N
    mu0 = np.asarray(res.samples["mu0"], np.float64).ravel()
    assert abs(mu0.mean() - ex_mean) < 0.1, (mu0.mean(), ex_mean)
    assert abs(mu0.var() / ex_var - 1.0) < 0.2, (mu0.var(), ex_var)
    z = np.asarray(res.samples[("data", "z")])
    assert z.shape == (80, 128, N)
    assert z.dtype == bool
    # per-point assignment marginals vs exact enumeration
    np.testing.assert_allclose(z.mean(axis=(0, 1)), ex_pz, atol=0.05)
    # summary covers discrete entries too
    assert res.summary[("data", "z")]["mean"].shape == (N,)


def test_regression_flagship_one_call():
    """The reference's flagship regression-with-outliers model through
    sample_posterior(key, model, args, obs) — no manual composition."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    from regression import make_dataset, model

    xs, ys = make_dataset(n=30)
    n = int(xs.shape[0])
    obs = gt.ChoiceMap()
    obs.set_submap("data", vector_choicemap(n, y=ys))
    res = sample_posterior(jax.random.PRNGKey(0), model, (xs,), obs,
                           num_chains=6, num_warmup=120, num_samples=120,
                           max_depth=6)
    assert res.info["engine"] == "gibbs_nuts"
    assert res.info["discrete_evals_per_sweep"] == 2 * n
    s = np.asarray(res.samples["slope"]).ravel()
    it = np.asarray(res.samples["intercept"]).ravel()
    assert abs(s.mean() + 1.2) < 0.3, s.mean()
    assert abs(it.mean() - 2.0) < 0.5, it.mean()
    out = np.asarray(res.samples[("data", "is_outlier")])
    assert out.shape == (120, 6, n)


@gen
def _scalar_mix_model():
    k = gt.categorical(jnp.asarray([0.5, 0.3, 0.2])) @ "k"
    locs = jnp.asarray([-3.0, 0.0, 3.0])
    mu = gt.normal(locs[k], 1.0) @ "mu"
    y = gt.normal(mu, 0.5) @ "y"
    return y


def test_scalar_categorical_site_matches_enumeration():
    """Scalar (non-vectorized) categorical address: the Gibbs block's
    posterior P(k | y) matches Rao-Blackwellized enumeration."""
    obs = gt.ChoiceMap().set_value("y", jnp.asarray(2.4, jnp.float32))
    res = sample_posterior(jax.random.PRNGKey(1), _scalar_mix_model, (),
                           obs, num_chains=64, num_warmup=60,
                           num_samples=120, max_depth=6)
    k_draws = np.asarray(res.samples["k"], np.int64).ravel()
    freqs = np.bincount(k_draws, minlength=3) / k_draws.size

    # oracle: enumerate k, integrate mu analytically (normal-normal)
    locs = np.asarray([-3.0, 0.0, 3.0])
    pri = np.asarray([0.5, 0.3, 0.2])
    var = 1.0 + 0.25
    log_ev = (np.log(pri) - 0.5 * (2.4 - locs) ** 2 / var
              - 0.5 * np.log(2 * np.pi * var))
    post = np.exp(log_ev - log_ev.max())
    post /= post.sum()
    np.testing.assert_allclose(freqs, post, atol=0.06)


@gen
def _disc_zoo(n):
    b = gt.bernoulli(0.3) @ "b"
    c = gt.categorical(jnp.full((4,), 0.25)) @ "c"
    u = gt.uniform_discrete(2, 5) @ "u"
    x = gt.normal(0.0, 1.0) @ "x"
    return x + b + c + u


def test_support_discovery():
    tr, _ = _disc_zoo.generate(jax.random.PRNGKey(0), (3,),
                               gt.ChoiceMap())
    obs = gt.ChoiceMap()
    sites = discover_discrete_sites(tr, obs, _disc_zoo, (3,))
    by_path = {s.path: s for s in sites}
    assert set(by_path) == {("b",), ("c",), ("u",)}
    np.testing.assert_array_equal(np.asarray(by_path[("b",)].support),
                                  [False, True])
    np.testing.assert_array_equal(np.asarray(by_path[("c",)].support),
                                  [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(by_path[("u",)].support),
                                  [2, 3, 4, 5])
    assert all(s.kind == "scalar" for s in sites)


@gen
def _poisson_model():
    lam = gt.gamma(2.0, 1.0) @ "lam"
    k = gt.poisson(lam) @ "k"
    y = gt.normal(jnp.asarray(k, jnp.float32), 1.0) @ "y"
    return y


def test_unbounded_support_raises_with_advice_and_override_works():
    obs = gt.ChoiceMap().set_value("y", jnp.asarray(3.0, jnp.float32))
    with pytest.raises(NotImplementedError, match="discrete_supports"):
        sample_posterior(jax.random.PRNGKey(0), _poisson_model, (), obs,
                         num_chains=2, num_warmup=5, num_samples=5)
    # explicit truncated support unblocks it
    res = sample_posterior(
        jax.random.PRNGKey(0), _poisson_model, (), obs,
        num_chains=4, num_warmup=30, num_samples=60,
        discrete_supports={"k": jnp.arange(12)})
    k = np.asarray(res.samples["k"], np.float64)
    assert 1.0 < k.mean() < 5.0


def test_fused_engines_still_refuse_discretes():
    ys = jnp.asarray([-2.0, 2.0], jnp.float32)
    obs = gt.ChoiceMap()
    obs.set_submap("data", vector_choicemap(2, y=ys))
    with pytest.raises(ValueError, match="cannot"):
        sample_posterior(jax.random.PRNGKey(0), gmm_model, (2,), obs,
                         num_chains=4, num_warmup=5, num_samples=5,
                         engine="hmc_fused")


def test_gmm_fused_mixed_engine_matches_enumeration():
    """engine='auto' on a stageable mixed model dispatches the FUSED
    alternating driver (round-5 stretch: the continuous block in the
    pair-scheduled Pallas kernel with per-chain discrete values as
    frozen coordinates, exact Gibbs refreshes every ~16 ticks + a fused
    alternating burn phase). Cross-chain moments + per-point assignment
    marginals vs exact 2^N enumeration."""
    ys = jnp.asarray([-2.3, -1.8, -0.4, 0.6, 2.2, 1.9], jnp.float32)
    N = int(ys.shape[0])
    ex_mean, ex_var, ex_pz = _gmm_exact_moments(ys)

    obs = gt.ChoiceMap()
    obs.set_submap("data", vector_choicemap(N, y=ys))
    res = sample_posterior(jax.random.PRNGKey(0), gmm_model, (N,), obs,
                           num_chains=128, num_warmup=150,
                           num_samples=120, engine="auto")
    assert res.info["engine"] == "gibbs_nuts_fused", res.info
    mu0 = np.asarray(res.samples["mu0"], np.float64)
    burn = mu0.shape[0] // 4
    mu0b = mu0[burn:].ravel()
    z = np.asarray(res.samples[("data", "z")], np.float64)[burn:]
    assert abs(mu0b.mean() - ex_mean) < 0.12, (mu0b.mean(), ex_mean)
    assert abs(mu0b.var() / ex_var - 1.0) < 0.3, (mu0b.var(), ex_var)
    np.testing.assert_allclose(z.mean(axis=(0, 1)), ex_pz, atol=0.06)
