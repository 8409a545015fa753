"""One-call sample_posterior: recovers exact conjugate posteriors with
healthy diagnostics, unflattens vector addresses correctly, and fails
cleanly on unobserved discrete latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import sample_posterior


def test_conjugate_normal_recovery():
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(0), model, (n,),
                           choicemap(ys=ys), num_chains=4, num_warmup=200,
                           num_samples=400)
    mu = np.asarray(out.samples["mu"])
    assert mu.shape == (400, 4)
    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    s = out.summary["mu"] if "mu" in out.summary else \
        out.summary[list(out.summary)[0]]
    assert abs(float(s["mean"]) - post_mean) < 0.03
    assert abs(float(s["sd"]) - 1 / np.sqrt(post_prec)) < 0.03
    assert float(s["rhat"]) < 1.05
    assert float(s["ess_bulk"]) > 200


def test_vector_address_unflattening():
    d = 3
    A = jnp.asarray(np.random.default_rng(0).standard_normal((10, d)))
    w_true = jnp.asarray([1.0, -0.5, 0.25])
    ys = A @ w_true

    @gen
    def model():
        w = gt.broadcasted_normal(jnp.zeros(d), 2.0) @ "w"
        b = gt.normal(0.0, 2.0) @ "b"
        gt.normal(A @ w + b, 0.1) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(1), model, (),
                           choicemap(ys=ys), num_chains=4, num_warmup=300,
                           num_samples=400)
    assert out.samples["w"].shape == (400, 4, d)
    assert out.samples["b"].shape == (400, 4)
    w_mean = np.asarray(out.samples["w"]).mean(axis=(0, 1))
    np.testing.assert_allclose(w_mean, np.asarray(w_true), atol=0.15)
    assert out.summary["w"]["ess_bulk"].shape == (d,)


def test_discrete_latent_error():
    @gen
    def mixed():
        z = gt.bernoulli(0.5) @ "z"
        gt.normal(jnp.where(z, 1.0, -1.0), 1.0) @ "y"

    with pytest.raises(ValueError, match="discrete"):
        sample_posterior(jax.random.PRNGKey(0), mixed, (),
                         choicemap(y=0.5), num_chains=2, num_warmup=10,
                         num_samples=10)


def test_explicit_selection():
    @gen
    def model():
        mu = gt.normal(0.0, 1.0) @ "mu"
        tau = gt.normal(0.0, 1.0) @ "tau"
        gt.normal(mu, jnp.exp(tau)) @ "y"

    out = sample_posterior(jax.random.PRNGKey(2), model, (),
                           choicemap(y=0.3, tau=0.0),
                           selection=select("mu"), num_chains=2,
                           num_warmup=100, num_samples=100)
    assert set(out.samples) == {"mu"}


def test_fsm_engine_matches_conjugate():
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(3), model, (n,),
                           choicemap(ys=ys), num_chains=8,
                           num_samples=256, engine="nuts_fsm",
                           num_ticks=2048)
    mu = np.asarray(out.samples["mu"])
    assert mu.shape[1] == 8 and 2 <= mu.shape[0] <= 256
    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    s = out.summary["mu"]
    assert abs(float(s["mean"]) - post_mean) < 0.04
    assert abs(float(s["sd"]) - 1 / np.sqrt(post_prec)) < 0.04
    assert float(s["rhat"]) < 1.05


def test_mesh_sharded_chains_identical():
    """Sharding the chains over an 8-device mesh must not change results:
    chains are independent, so partitioning inserts no collectives."""
    from gen_tpu.parallel import chain_mesh

    @gen
    def model():
        mu = gt.normal(0.0, 2.0) @ "mu"
        gt.normal(mu * jnp.ones(10), 1.0) @ "ys"

    obs = choicemap(ys=jnp.full(10, 1.0))
    kwargs = dict(num_chains=16, num_warmup=50, num_samples=50,
                  summarize=False)
    out_plain = sample_posterior(jax.random.PRNGKey(4), model, (), obs,
                                 **kwargs)
    out_mesh = sample_posterior(jax.random.PRNGKey(4), model, (), obs,
                                mesh=chain_mesh(8), **kwargs)
    np.testing.assert_allclose(np.asarray(out_mesh.samples["mu"]),
                               np.asarray(out_plain.samples["mu"]),
                               rtol=0, atol=1e-9)


def test_chees_engine_matches_conjugate():
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(5), model, (n,),
                           choicemap(ys=ys), num_chains=16,
                           num_warmup=300, num_samples=400, engine="chees")
    mu = np.asarray(out.samples["mu"])
    assert mu.shape == (400, 16)
    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    s = out.summary["mu"]
    assert abs(float(s["mean"]) - post_mean) < 0.04
    assert abs(float(s["sd"]) - 1 / np.sqrt(post_prec)) < 0.04
    assert float(s["rhat"]) < 1.05
    assert float(out.info["mean_accept"]) > 0.5
    # partial selections are supported since round 3 (frozen coordinates:
    # each chain conditions on its own unselected values) — returns only
    # the selected address
    @gen
    def model2(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        tau = gt.normal(0.0, 1.0) @ "tau"
        gt.normal(mu * jnp.ones(n), jnp.exp(tau)) @ "ys"

    out2 = sample_posterior(jax.random.PRNGKey(6), model2, (n,),
                            choicemap(ys=ys), selection=select("mu"),
                            num_chains=4, num_warmup=30, num_samples=20,
                            engine="chees")
    assert set(out2.samples) == {"mu"}
    assert out2.samples["mu"].shape == (20, 4)
    with pytest.raises(ValueError, match="num_chains >= 2"):
        sample_posterior(jax.random.PRNGKey(6), model, (n,),
                         choicemap(ys=ys), num_chains=1, engine="chees")


def test_hmc_fused_engine_matches_conjugate():
    """engine='hmc_fused': ChEES warmup + fused sampler (XLA fallback on
    CPU) recovers the exact conjugate posterior through the one-call API."""
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(7), model, (n,),
                           choicemap(ys=ys), num_chains=16,
                           num_warmup=300, num_samples=400,
                           engine="hmc_fused")
    mu = np.asarray(out.samples["mu"])
    assert mu.shape == (400, 16)
    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    s = out.summary["mu"]
    assert abs(float(s["mean"]) - post_mean) < 0.04
    assert abs(float(s["sd"]) - 1 / np.sqrt(post_prec)) < 0.04
    assert float(s["rhat"]) < 1.05
    assert float(out.info["mean_accept"]) > 0.5


def test_nuts_fused_engine_matches_conjugate():
    """engine='nuts_fused': ChEES warmup + fused FSM-NUTS kernel (XLA FSM
    fallback on CPU), draws extracted once per completed trajectory."""
    n, sigma, prior_std = 20, 1.0, 3.0
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, prior_std) @ "mu"
        gt.normal(mu * jnp.ones(n), sigma) @ "ys"

    out = sample_posterior(jax.random.PRNGKey(5), model, (n,),
                           choicemap(ys=ys), num_chains=16,
                           num_warmup=300, num_samples=256,
                           engine="nuts_fused", num_ticks=2048)
    mu = np.asarray(out.samples["mu"])
    assert mu.shape[1] == 16 and 2 <= mu.shape[0] <= 256
    post_prec = 1 / prior_std ** 2 + n / sigma ** 2
    post_mean = (float(ys.sum()) / sigma ** 2) / post_prec
    s = out.summary["mu"]
    assert abs(float(s["mean"]) - post_mean) < 0.04
    assert abs(float(s["sd"]) - 1 / np.sqrt(post_prec)) < 0.04
    assert float(s["rhat"]) < 1.05
    assert float(np.mean(np.asarray(out.info["mean_depth"]))) >= 1.0


def test_auto_engine_picks_fused_on_scalarizable_model():
    """engine='auto' dispatches nuts_fused when the logp stages (the
    conjugate-normal model scalarizes: sufficient-statistic likelihood)."""
    from gen_tpu.inference.sample import _auto_engine

    n = 12
    ys = jnp.full(n, 2.0)

    @gen
    def model(n):
        mu = gt.normal(0.0, 3.0) @ "mu"
        gt.normal(mu * jnp.ones(n), 1.0) @ "ys"

    obs = choicemap(ys=ys)
    tr, _ = model.generate(jax.random.PRNGKey(0), (n,), obs)
    from gen_tpu.inference.sample import _default_selection
    sel, _ = _default_selection(tr, obs)
    assert _auto_engine(tr, obs, sel, 8)[0] == "nuts_fused"
    # single chain cannot warm up with ChEES
    assert _auto_engine(tr, obs, sel, 1)[0] == "nuts"

    out = sample_posterior(jax.random.PRNGKey(0), model, (n,), obs,
                           num_chains=8, num_warmup=150, num_samples=150,
                           engine="auto")
    mu = np.asarray(out.samples["mu"])
    assert mu.shape[1] == 8 and mu.shape[0] >= 2
    post_mean = (float(ys.sum())) / (1 / 9 + n)
    assert abs(mu.mean() - post_mean) < 0.1


def test_auto_engine_falls_back_on_unscalarizable_model():
    """Models whose assess-logp cannot stage into the fused kernel must
    dispatch to the XLA nuts engine — but since round 4 a
    non-sufficient-statistic likelihood over a large array STREAMS
    (ops/scalarize stream staging) and dispatches FUSED; only genuinely
    unstageable residuals (e.g. sort) fall back, caught by the probe at
    plane-function evaluation."""
    from gen_tpu.inference.sample import (_auto_engine,
                                          _default_selection)

    xs_big = jnp.linspace(0.0, 1.0, 2048)

    @gen
    def big_residual_model():
        mu = gt.normal(0.0, 1.0) @ "mu"
        gt.normal(jnp.sin(mu * xs_big), 1.0) @ "ys"

    obs = choicemap(ys=jnp.zeros(2048))
    tr, _ = big_residual_model.generate(jax.random.PRNGKey(0), (), obs)
    sel, _ = _default_selection(tr, obs)
    # round 3 fell back here (residual cap); round 4 streams the dataset
    assert _auto_engine(tr, obs, sel, 8)[0] == "nuts_fused"

    @gen
    def sort_model():
        a = gt.normal(0.0, 1.0) @ "a"
        b = gt.normal(0.0, 1.0) @ "b"
        lo = jnp.sort(jnp.stack([a, b]))[0]
        gt.normal(lo, 0.5) @ "y"

    obs2 = choicemap(y=jnp.asarray(0.3))
    tr2, _ = sort_model.generate(jax.random.PRNGKey(0), (), obs2)
    sel2, _ = _default_selection(tr2, obs2)
    assert _auto_engine(tr2, obs2, sel2, 8)[0] == "nuts"

    out = sample_posterior(jax.random.PRNGKey(1), sort_model, (), obs2,
                           num_chains=4, num_warmup=100, num_samples=100,
                           engine="auto")
    assert out.samples["a"].shape == (100, 4)


def test_auto_engine_partial_selection_dispatches_fused():
    """Since round 3 partial selections reach the fused engine (frozen
    coordinates), so auto dispatches it for a scalarizable model even
    with a partial selection — and the run returns only the selected
    address."""
    from gen_tpu.inference.sample import _auto_engine

    @gen
    def model():
        a = gt.normal(0.0, 1.0) @ "a"
        b = gt.normal(0.0, 1.0) @ "b"
        gt.normal(a + b, 0.5) @ "y"

    obs = choicemap(y=jnp.asarray(0.3))
    tr, _ = model.generate(jax.random.PRNGKey(0), (), obs)
    assert _auto_engine(tr, obs, select("a"), 8)[0] == "nuts_fused"
    out = sample_posterior(jax.random.PRNGKey(1), model, (), obs,
                           selection=select("a"), num_chains=8,
                           num_warmup=50, num_samples=30, engine="auto")
    assert set(out.samples) == {"a"}


def test_dense_mass_fused_engines_on_correlated_gaussian():
    """mass='dense' (Cholesky-whitened kernel run, gen_tpu/inference/mass.py)
    recovers a densely correlated Gaussian posterior through both fused
    engines; the diagonal-mass moments are the baseline it must match."""
    d = 6
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lams = np.geomspace(1.0, 300.0, d) - 1.0
    A = jnp.asarray(np.sqrt(lams)[:, None] * Q.T, jnp.float32)
    ys = jnp.asarray(A @ rng.standard_normal(d)
                     + rng.standard_normal(d), jnp.float32)
    S = np.linalg.inv(np.eye(d) + np.asarray(A, np.float64).T @ A)
    mean_ex = S @ (np.asarray(A, np.float64).T @ np.asarray(ys, np.float64))
    sd_ex = np.sqrt(np.diag(S))

    @gen
    def model():
        x = gt.normal(jnp.zeros(d), 1.0) @ "x"
        gt.normal_linear(A, x, 1.0) @ "ys"

    for engine in ("hmc_fused", "nuts_fused"):
        out = sample_posterior(
            jax.random.PRNGKey(3), model, (), choicemap(ys=ys),
            num_chains=256, num_warmup=300, num_samples=64,
            engine=engine, mass="dense")
        xs = np.asarray(out.samples["x"], np.float64).reshape(-1, d)
        # cross-chain-and-draw moments vs exact
        np.testing.assert_allclose(xs.mean(axis=0), mean_ex,
                                   atol=4.0 * sd_ex.max() * 0.25)
        np.testing.assert_allclose(xs.std(axis=0) / sd_ex,
                                   np.ones(d), rtol=0, atol=0.25)


def test_lowrank_mass_fused_engine_high_dim():
    """mass='lowrank' (diag + rank-k whitening) handles a d=40 correlated
    Gaussian where mass='dense' must refuse (d^2 residual scalars exceed
    the scalarization cap); moments match the exact posterior."""
    d, k_corr = 40, 4
    rng = np.random.default_rng(1)
    # strong correlations confined to a rank-k_corr subspace + mild diag
    U = np.linalg.qr(rng.standard_normal((d, k_corr)))[0]
    A = jnp.asarray((U * np.sqrt([900.0, 400.0, 100.0, 25.0])).T,
                    jnp.float32)               # (k_corr, d) observation map
    ys = jnp.asarray(A @ rng.standard_normal(d)
                     + rng.standard_normal(k_corr), jnp.float32)
    S = np.linalg.inv(np.eye(d) + np.asarray(A, np.float64).T @ A)
    mean_ex = S @ (np.asarray(A, np.float64).T @ np.asarray(ys, np.float64))
    sd_ex = np.sqrt(np.diag(S))

    @gen
    def model():
        x = gt.normal(jnp.zeros(d), 1.0) @ "x"
        gt.normal_linear(A, x, 1.0) @ "ys"

    with pytest.raises(ValueError, match="lowrank"):
        sample_posterior(jax.random.PRNGKey(0), model, (),
                         choicemap(ys=ys), num_chains=64, num_warmup=50,
                         num_samples=8, engine="hmc_fused", mass="dense")

    out = sample_posterior(
        jax.random.PRNGKey(3), model, (), choicemap(ys=ys),
        num_chains=256, num_warmup=300, num_samples=64,
        engine="hmc_fused", mass="lowrank", mass_rank=6)
    xs = np.asarray(out.samples["x"], np.float64).reshape(-1, d)
    np.testing.assert_allclose(xs.mean(axis=0), mean_ex,
                               atol=4.0 * sd_ex.max() * 0.25)
    np.testing.assert_allclose(xs.std(axis=0) / sd_ex, np.ones(d),
                               rtol=0, atol=0.25)


def test_partial_selection_fused_engines_condition_per_chain():
    """Partial selections through the fused/chees engines: unselected
    coordinates are frozen per chain (each chain conditions on its OWN
    generate-sampled value). Validation: a ~ N(0,1), b ~ N(0,1),
    y ~ N(a+b, s); sampling only "a" must leave each chain's b at its
    initial draw, and the standardized residual (a - m(b_i)) / sd must be
    N(0, 1) across chains x draws."""
    s = 0.5
    y_obs = jnp.asarray(0.8)

    @gen
    def model():
        a = gt.normal(0.0, 1.0) @ "a"
        b = gt.normal(0.0, 1.0) @ "b"
        gt.normal(a + b, s) @ "y"

    obs = choicemap(y=y_obs)
    # per-chain conditional: a | b, y ~ N(m(b), v), v = 1/(1 + 1/s^2)
    v = 1.0 / (1.0 + 1.0 / s ** 2)
    sd = np.sqrt(v)

    # recover each chain's frozen b from the init path (same key stream)
    # (nuts_fsm joined the partial-selection engines in round 4)
    for engine in ("chees", "hmc_fused", "nuts_fused", "nuts_fsm"):
        key = jax.random.PRNGKey(11)
        n_chains = 128
        out = sample_posterior(
            key, model, (), obs, selection=select("a"),
            num_chains=n_chains, num_warmup=200, num_samples=64,
            engine=engine)
        assert set(out.samples) == {"a"}, (engine, set(out.samples))
        a = np.asarray(out.samples["a"], np.float64)  # (draws, chains)
        # replicate the engine's init to get the per-chain frozen b
        k_init, _ = jax.random.split(key)
        init_keys = jax.random.split(k_init, n_chains)
        traces, _ = jax.vmap(
            lambda k: model.generate(k, (), obs))(init_keys)
        b = np.asarray(traces["b"], np.float64)
        m = v * (float(y_obs) - b) / s ** 2
        z = (a - m[None, :]) / sd
        assert abs(z.mean()) < 0.08, (engine, z.mean())
        assert abs(z.std() - 1.0) < 0.08, (engine, z.std())


def test_selection_outside_universe_rejected():
    """Selecting an observed address through a flat engine must raise a
    clear validation error, not crash in reshape (round-3 review)."""
    @gen
    def model():
        mu = gt.normal(0.0, 1.0) @ "mu"
        gt.normal(mu, 0.5) @ "y"

    obs = choicemap(y=jnp.asarray(0.3))
    with pytest.raises(ValueError, match="outside the unobserved"):
        sample_posterior(jax.random.PRNGKey(0), model, (), obs,
                         selection=select("mu", "y"), num_chains=4,
                         num_warmup=10, num_samples=10,
                         engine="hmc_fused")


def test_engine_visibility_in_info():
    """info['engine'] records the engine that actually ran; engine='auto'
    adds the dispatch reason, and a fallback to the XLA path warns
    (VERDICT r3 item 7: the silent 1000x cliff must not be silent)."""
    import warnings

    @gen
    def model():
        mu = gt.normal(0.0, 1.0) @ "mu"
        gt.normal(mu, 0.5) @ "y"

    obs = choicemap(y=jnp.asarray(0.3))
    out = sample_posterior(jax.random.PRNGKey(0), model, (), obs,
                           num_chains=4, num_warmup=50, num_samples=32,
                           engine="auto")
    assert out.info["engine"] == "nuts_fused"
    assert out.info["engine_requested"] == "auto"
    assert "probe passed" in out.info["engine_reason"]

    # unscalarizable model: a traced-index gather in the likelihood —
    # neither unrollable nor streamable (note a plain per-point
    # heavy-tail likelihood now STREAMS through the fused path since
    # round 4, so it no longer triggers the fallback) -> fallback + warn
    table = jnp.asarray([0.0, 0.5, 1.0, 1.5], jnp.float32)

    @gen
    def hard():
        mu = gt.normal(0.0, 1.0) @ "mu"
        ix = jnp.clip(jnp.abs(mu).astype(jnp.int32), 0, 3)
        gt.normal(table[ix] + mu, 0.5) @ "y"

    obs2 = choicemap(y=jnp.asarray(0.3, jnp.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out2 = sample_posterior(jax.random.PRNGKey(0), hard, (), obs2,
                                num_chains=4, num_warmup=50,
                                num_samples=32, engine="auto")
    assert out2.info["engine"] == "nuts"
    assert "scalarize" in out2.info["engine_reason"]
    assert any("fell back" in str(x.message) for x in w)

    # explicit engines record themselves too, with no reason field
    out3 = sample_posterior(jax.random.PRNGKey(0), model, (), obs,
                            num_chains=4, num_warmup=50, num_samples=32,
                            engine="chees")
    assert out3.info["engine"] == "chees"
    assert out3.info["engine_requested"] == "chees"
    assert "engine_reason" not in out3.info


def test_partial_selection_with_structured_mass():
    """Partial selections compose with mass='dense'/'lowrank' (round 5,
    VERDICT r4 item 9): the metric is estimated on the free subset and is
    the exact identity on the frozen coordinates (mass.partial_*), so
    each chain still conditions on its OWN frozen values. Validation: a
    correlated-Gaussian free block x (where a diagonal mass is a poor
    metric) plus a frozen shift b; per-chain standardized residuals of
    the conditional posterior x | b_i, ys must be N(0, 1), and b must
    never move."""
    d = 4
    rng = np.random.default_rng(2)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lams = np.geomspace(1.0, 120.0, d)
    A = jnp.asarray(np.sqrt(lams)[:, None] * Q.T, jnp.float32)
    ys = jnp.asarray(np.asarray(A) @ rng.standard_normal(d)
                     + rng.standard_normal(d), jnp.float32)
    An = np.asarray(A, np.float64)
    S = np.linalg.inv(np.eye(d) + An.T @ An)
    sd_ex = np.sqrt(np.diag(S))

    @gen
    def model():
        x = gt.normal(jnp.zeros(d), 1.0) @ "x"
        b = gt.normal(0.0, 1.0) @ "b"
        gt.normal(A @ x + b, 1.0) @ "ys"

    obs = choicemap(ys=ys)
    for engine, mass in (("hmc_fused", "dense"), ("hmc_fused", "lowrank"),
                         ("nuts_fused", "dense")):
        key = jax.random.PRNGKey(21)
        n_chains = 160
        out = sample_posterior(
            key, model, (), obs, selection=select("x"),
            num_chains=n_chains, num_warmup=300, num_samples=64,
            engine=engine, mass=mass, mass_rank=2)
        assert set(out.samples) == {"x"}, (engine, mass)
        xs = np.asarray(out.samples["x"], np.float64)  # (draws, chains, d)
        # per-chain frozen b from the engine's own init stream
        k_init, _ = jax.random.split(key)
        init_keys = jax.random.split(k_init, n_chains)
        traces, _ = jax.vmap(
            lambda k: model.generate(k, (), obs))(init_keys)
        b = np.asarray(traces["b"], np.float64)          # (chains,)
        m = (S @ (An.T @ (np.asarray(ys, np.float64)[:, None]
                          - b[None, :]))).T              # (chains, d)
        z = (xs - m[None, :, :]) / sd_ex[None, None, :]
        assert abs(z.mean()) < 0.1, (engine, mass, z.mean())
        assert abs(z.std() - 1.0) < 0.12, (engine, mass, z.std())
