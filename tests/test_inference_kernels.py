"""Inference-kernel correctness: exact-marginal checks on conjugate models
(reference patterns: test/inference/importance_sampling.jl, mh.jl, hmc.jl,
mala.jl, elliptical_slice.jl — but with quantitative posterior checks where
the reference only smoke-tests)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import (elliptical_slice, hmc, importance_resampling,
                               importance_sampling, mala, map_optimize,
                               mh_selection, mh_proposal)

KEY = jax.random.PRNGKey(0)

# conjugate: mu ~ N(0,3); 20 obs at 2.0 with noise 1
# posterior: N(1.9890, 0.2230^2); log-evidence exact below
N_OBS, OBS_VAL = 20, 2.0
POST_VAR = 1 / (1 / 9 + N_OBS)
POST_MU = POST_VAR * N_OBS * OBS_VAL


@gen
def conj_model(n):
    mu = gt.normal(0.0, 3.0) @ "mu"
    gt.normal(mu * jnp.ones(n), 1.0) @ "ys"
    return mu


OBS = choicemap(ys=jnp.full(N_OBS, OBS_VAL))


def exact_log_ml():
    cov = 9 * np.ones((N_OBS, N_OBS)) + np.eye(N_OBS)
    return stats.multivariate_normal.logpdf(
        np.full(N_OBS, OBS_VAL), np.zeros(N_OBS), cov)


def test_importance_sampling_log_ml():
    _, lnw, lml = importance_sampling(KEY, conj_model, (N_OBS,), OBS, 5000)
    np.testing.assert_allclose(np.exp(lnw).sum(), 1.0, rtol=1e-8)
    np.testing.assert_allclose(lml, exact_log_ml(), atol=0.15)


def test_importance_resampling_respects_observations():
    tr, lml = importance_resampling(KEY, conj_model, (N_OBS,), OBS, 100)
    np.testing.assert_allclose(np.asarray(tr.get_choices()["ys"]),
                               np.full(N_OBS, OBS_VAL))


def test_custom_proposal_importance():
    @gen
    def prop():
        gt.normal(POST_MU, np.sqrt(POST_VAR)) @ "mu"

    _, _, lml = importance_sampling(KEY, conj_model, (N_OBS,), OBS, 500,
                                    proposal=prop)
    # proposal == posterior -> near-zero-variance estimator
    np.testing.assert_allclose(lml, exact_log_ml(), atol=0.02)


def _run_chain(step, init, n, seed=1):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    final, out = jax.lax.scan(step, init, keys)
    return np.asarray(out)


def test_mh_selection_posterior():
    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)

    def step(tr, k):
        tr, _ = mh_selection(k, tr, select("mu"))
        return tr, tr["mu"]

    mus = _run_chain(step, tr, 4000)[500:]
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.06)
    np.testing.assert_allclose(mus.std(), np.sqrt(POST_VAR), atol=0.04)


def test_mh_custom_proposal_posterior():
    @gen
    def drift_prop(tr):
        gt.normal(tr["mu"], 0.25) @ "mu"

    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)

    def step(tr, k):
        tr, _ = mh_proposal(k, tr, drift_prop)
        return tr, tr["mu"]

    mus = _run_chain(step, tr, 4000)[500:]
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.05)
    np.testing.assert_allclose(mus.std(), np.sqrt(POST_VAR), atol=0.04)


def test_hmc_posterior():
    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)

    def step(tr, k):
        tr, acc = hmc(k, tr, select("mu"), L=5, eps=0.05)
        return tr, (tr["mu"], acc)

    keys = jax.random.split(jax.random.PRNGKey(2), 1500)
    _, (mus, accs) = jax.lax.scan(step, tr, keys)
    mus = np.asarray(mus)[300:]
    assert np.mean(np.asarray(accs)) > 0.7
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.06)
    np.testing.assert_allclose(mus.std(), np.sqrt(POST_VAR), atol=0.05)


def test_hmc_vmapped_chains():
    n_chains = 16
    keys = jax.random.split(KEY, n_chains)
    traces, _ = jax.vmap(
        lambda k: conj_model.generate(k, (N_OBS,), OBS))(keys)

    def one_step(tr, k):
        new_tr, acc = hmc(k, tr, select("mu"), L=5, eps=0.05)
        return new_tr, acc

    step_keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    new_traces, accs = jax.vmap(one_step)(traces, step_keys)
    assert accs.shape == (n_chains,)
    assert new_traces.get_score().shape == (n_chains,)


def test_hmc_chains_flat_posterior():
    """hmc_chains (vectorized flat-chain path) samples the same conjugate
    posterior as per-trace hmc, and its traces rebuild correctly."""
    from gen_tpu.inference import hmc_chains
    from gen_tpu.inference.target import FlatTarget

    n_chains = 64
    keys = jax.random.split(KEY, n_chains)
    traces, _ = jax.vmap(
        lambda k: conj_model.generate(k, (N_OBS,), OBS))(keys)
    one = jax.tree_util.tree_map(lambda x: x[0], traces)
    sel = select("mu")
    target = FlatTarget(one, sel)
    values0 = jax.vmap(
        lambda tr: tr.get_choices().filter(sel).to_array())(traces)

    values, samples, accepts = jax.jit(
        lambda v, k: hmc_chains(k, target, v, n_steps=400, L=5, eps=0.05))(
            values0, jax.random.PRNGKey(2))
    assert samples.shape == (400, n_chains, 1)
    assert accepts.shape == (400, n_chains)
    assert float(jnp.mean(accepts)) > 0.7
    mus = np.asarray(samples)[100:, :, 0].ravel()
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.03)
    np.testing.assert_allclose(mus.std(), np.sqrt(POST_VAR), atol=0.03)
    # rebuild: traces with the final values, observations intact
    final = jax.vmap(target.rebuild)(values)
    np.testing.assert_allclose(np.asarray(final.get_choices()["mu"]),
                               np.asarray(values[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(final.get_choices()["ys"])[0],
                               np.full(N_OBS, OBS_VAL))
    # collect hook
    _, collected, _ = hmc_chains(
        jax.random.PRNGKey(3), target, values0, n_steps=3, L=2, eps=0.05,
        collect=lambda v: v[:, 0] * 2.0)
    assert collected.shape == (3, n_chains)


def test_mala_posterior():
    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)

    def step(tr, k):
        tr, _ = mala(k, tr, select("mu"), 0.005)
        return tr, tr["mu"]

    mus = _run_chain(step, tr, 3000)[500:]
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.06)


def test_map_optimize_finds_mode():
    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)
    for _ in range(40):
        tr = map_optimize(tr, select("mu"))
    np.testing.assert_allclose(float(tr["mu"]), POST_MU, atol=1e-4)


def test_elliptical_slice_posterior():
    @gen
    def ess_model():
        f = gt.mvnormal(jnp.zeros(3), jnp.eye(3)) @ "f"
        gt.normal(f, 0.5) @ "y"
        return f

    obs = choicemap(y=jnp.array([1.0, 1.0, 1.0]))
    tr, _ = ess_model.generate(KEY, (), obs)

    def step(tr, k):
        tr = elliptical_slice(k, tr, "f", jnp.zeros(3), jnp.eye(3))
        return tr, tr["f"]

    fs = _run_chain(step, tr, 4000)[500:]
    # exact posterior mean: (1/0.25)/(1 + 1/0.25) = 0.8 per coordinate
    np.testing.assert_allclose(fs.mean(axis=0), 0.8, atol=0.05)


def test_hmc_with_mass_matrix():
    tr, _ = conj_model.generate(KEY, (N_OBS,), OBS)

    def step(tr, k):
        tr, _ = hmc(k, tr, select("mu"), L=5, eps=0.3,
                    inv_mass_diag=jnp.array([0.05]))
        return tr, tr["mu"]

    mus = _run_chain(step, tr, 3000)[500:]
    np.testing.assert_allclose(mus.mean(), POST_MU, atol=0.05)
    np.testing.assert_allclose(mus.std(), np.sqrt(POST_VAR), atol=0.04)


def test_for_range_reversal():
    """for_range sweeps kernels in index order; its reversal reverses BOTH
    the range and each body kernel (reference kernel_dsl.jl:118-226)."""
    from gen_tpu.inference import for_range, reversal, primitive_kernel

    log = []

    def make(i):
        def fwd(key, trace, *args):
            log.append(("f", i))
            return trace, None

        def bwd(key, trace, *args):
            log.append(("b", i))
            return trace, None

        return primitive_kernel(fwd, reversal_fn=bwd)

    k = for_range(4, make)
    k(jax.random.PRNGKey(0), None)
    assert log == [("f", 0), ("f", 1), ("f", 2), ("f", 3)]
    log.clear()
    reversal(k)(jax.random.PRNGKey(0), None)
    assert log == [("b", 3), ("b", 2), ("b", 1), ("b", 0)]
    # round trip: reversal(reversal(k)) is k's order again
    log.clear()
    reversal(reversal(k))(jax.random.PRNGKey(0), None)
    assert log == [("f", 0), ("f", 1), ("f", 2), ("f", 3)]


def test_for_range_stationarity():
    """A position sweep built with for_range leaves the posterior invariant
    (each body is a selection-MH move on one coordinate)."""
    from gen_tpu.inference import for_range, mh_selection

    @gen
    def m():
        for i in range(3):
            gt.normal(0.0, 1.0) @ ("x", i)

    def make(i):
        def k(key, trace):
            return mh_selection(key, trace, gt.select(("x", i)))
        return k

    sweep = for_range(3, make)
    tr = m.simulate(jax.random.PRNGKey(0), ())

    @jax.jit
    def run(tr, key):
        def body(t, k):
            t, _ = sweep(k, t)
            return t, t[("x", 0)]
        return jax.lax.scan(body, tr, jax.random.split(key, 400))

    _, xs = run(tr, jax.random.PRNGKey(1))
    s = np.asarray(xs)[100:]
    assert abs(s.mean()) < 0.25 and abs(s.std() - 1.0) < 0.25
