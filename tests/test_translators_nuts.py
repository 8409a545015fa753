"""Trace transforms / involutive MCMC (reference: test/inference/mh.jl:13-48
— both a transform-DSL involution and an equivalent hand-written one, with
round-trip checks), kernel DSL, and NUTS posterior recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import (checked, mh_involutive, mh_selection, nuts,
                               nuts_warmup_and_sample, reversal, seq,
                               transform, mixture, repeat)

KEY = jax.random.PRNGKey(0)


# -- transform DSL: log|det J| ---------------------------------------------

def test_transform_jacobian_scalar():
    @transform
    def double_it(ctx):
        x = ctx.model_in["x"]
        ctx.model_out["x"] = 2.0 * x

    _, _, logJ = double_it.run(choicemap(x=3.0), gt.ChoiceMap())
    np.testing.assert_allclose(logJ, np.log(2.0), rtol=1e-10)


def test_transform_jacobian_coupled():
    # (x, y) -> (x + y, x - y): |det J| = 2
    @transform
    def rot(ctx):
        x = ctx.model_in["x"]
        y = ctx.model_in["y"]
        ctx.model_out["x"] = x + y
        ctx.model_out["y"] = x - y

    _, _, logJ = rot.run(choicemap(x=1.0, y=2.0), gt.ChoiceMap())
    np.testing.assert_allclose(logJ, np.log(2.0), rtol=1e-10)


def test_transform_non_square_errors():
    @transform
    def bad(ctx):
        x = ctx.model_in["x"]
        ctx.model_out["a"] = x
        ctx.model_out["b"] = 2 * x

    with pytest.raises(ValueError):
        bad.run(choicemap(x=1.0), gt.ChoiceMap())


def test_transform_copy_and_discrete():
    @transform
    def f(ctx):
        b = ctx.model_in.discrete["b"]
        ctx.model_out.discrete["b"] = ~b
        ctx.copy("model_in", "keep", "model_out", "keep")
        x = ctx.model_in["x"]
        ctx.model_out["x"] = -x

    mo, ao, logJ = f.run(choicemap(b=jnp.asarray(True), keep=5.0, x=2.0),
                         gt.ChoiceMap())
    assert bool(mo["b"]) is False
    np.testing.assert_allclose(mo["keep"], 5.0)
    np.testing.assert_allclose(mo["x"], -2.0)
    np.testing.assert_allclose(logJ, 0.0, atol=1e-12)


# -- involutive MCMC -------------------------------------------------------
#
# bimodal model: z ~ bernoulli(0.5); if z: x ~ N(2,0.5) else x ~ N(-2,0.5)
# involution: flip z and negate x — exactly maps one mode onto the other.

@gen
def bimodal():
    z = gt.bernoulli(0.5) @ "z"
    if z:
        gt.normal(2.0, 0.5) @ "x"
    else:
        gt.normal(-2.0, 0.5) @ "x"


@gen
def null_proposal(tr):
    gt.bernoulli(0.5) @ "dummy"


@transform
def flip_involution(ctx):
    z = ctx.model_in.discrete["z"]
    x = ctx.model_in["x"]
    ctx.model_out.discrete["z"] = jnp.logical_not(z)
    ctx.model_out["x"] = -x
    ctx.copy("aux_in", "dummy", "aux_out", "dummy")


def test_involutive_mh_mode_hopping():
    tr, _ = bimodal.generate(KEY, (), choicemap(z=True, x=2.0))
    zs = []
    key = KEY
    for i in range(200):
        key, sub = jax.random.split(key)
        tr, acc = mh_involutive(sub, tr, null_proposal, (), flip_involution,
                                check=(i < 3))
        zs.append(bool(tr["z"]))
    # symmetric modes: the flip should accept often and visit both modes
    frac = np.mean(zs)
    assert 0.25 < frac < 0.75
    # x sign always matches mode
    assert bool(tr["z"]) == (float(tr["x"]) > 0)


def test_involutive_mh_plain_function():
    def invol(trace, fwd_choices, fwd_ret, args):
        z = bool(trace["z"])
        x = float(trace["x"])
        cons = choicemap(z=not z, x=-x)
        new_trace, w, _, _ = trace.update(None, cons)
        return new_trace, fwd_choices, w

    tr, _ = bimodal.generate(KEY, (), choicemap(z=True, x=2.0))
    flips = 0
    key = KEY
    for i in range(100):
        key, sub = jax.random.split(key)
        z_before = bool(tr["z"])
        tr, acc = mh_involutive(sub, tr, null_proposal, (), invol)
        flips += int(bool(tr["z"]) != z_before)
    assert flips > 20


def test_involution_scaling_jacobian_balance():
    """Non-volume-preserving involution: x -> c/x on x ~ Gamma; acceptance
    must include |d(c/x)/dx| = c/x^2, which the transform provides."""
    @gen
    def gmodel():
        gt.gamma(2.0, 1.0) @ "x"

    c = 1.0

    @transform
    def inv(ctx):
        x = ctx.model_in["x"]
        ctx.model_out["x"] = c / x
        ctx.copy("aux_in", "dummy", "aux_out", "dummy")

    # round-trip check on a few steps proves involution validity
    tr, _ = gmodel.generate(KEY, (), choicemap(x=2.0))
    key = KEY
    xs = []
    for i in range(2000):
        key, sub = jax.random.split(key)
        tr, _ = mh_involutive(sub, tr, null_proposal, (), inv, check=(i < 2))
        key, sub2 = jax.random.split(key)
        tr, _ = mh_selection(sub2, tr, select("x"))
        xs.append(float(tr["x"]))
    # chain must still target Gamma(2,1): mean 2, var 2
    xs = np.asarray(xs[200:])
    np.testing.assert_allclose(xs.mean(), 2.0, atol=0.15)
    np.testing.assert_allclose(xs.var(), 2.0, atol=0.5)


# -- kernel DSL ------------------------------------------------------------

def test_kernel_composition():
    @gen
    def m():
        a = gt.normal(0.0, 1.0) @ "a"
        gt.normal(a, 0.5) @ "y"

    obs = choicemap(y=1.0)
    tr, _ = m.generate(KEY, (), obs)

    def k_a(key, trace):
        return mh_selection(key, trace, select("a"))

    composite = seq(repeat(3, k_a), mixture([0.5, 0.5], [k_a, k_a]))
    new_tr, _ = checked(composite, obs)(KEY, tr)
    assert float(new_tr["y"]) == 1.0
    # reversal exists and runs
    rev = reversal(composite)
    new_tr2, _ = rev(jax.random.PRNGKey(1), new_tr)
    # posterior check: a | y=1.0 ~ N(0.8, 0.2)
    def step(trace, k):
        trace, _ = composite(k, trace)
        return trace, trace["a"]
    cur = tr
    vals = []
    key = KEY
    for i in range(800):
        key, sub = jax.random.split(key)
        cur, a = step(cur, sub)
        vals.append(float(a))
    vals = np.asarray(vals[100:])
    np.testing.assert_allclose(vals.mean(), 0.8, atol=0.06)


# -- NUTS ------------------------------------------------------------------

def test_nuts_posterior():
    @gen
    def model(n):
        mu = gt.normal(0.0, 3.0) @ "mu"
        gt.normal(mu * jnp.ones(n), 1.0) @ "ys"

    obs = choicemap(ys=jnp.full(20, 2.0))
    tr, _ = model.generate(KEY, (20,), obs)
    samples, final_tr, info = nuts_warmup_and_sample(
        jax.random.PRNGKey(1), tr, select("mu"),
        num_warmup=200, num_samples=800)
    mus = np.asarray(samples)[:, 0]
    np.testing.assert_allclose(mus.mean(), 1.9890, atol=0.03)
    np.testing.assert_allclose(mus.std(), 0.2230, atol=0.03)
    assert float(info["mean_accept"]) > 0.6


def test_nuts_vmapped_chains():
    @gen
    def model():
        gt.normal(0.0, 1.0) @ "x"
        gt.normal(0.0, 1.0) @ "y"

    keys = jax.random.split(KEY, 8)
    traces = jax.vmap(lambda k: model.simulate(k, ()))(keys)
    step_keys = jax.random.split(jax.random.PRNGKey(1), 8)

    def one(tr, k):
        new_tr, stats = nuts(k, tr, gt.ALL, step_size=0.5)
        return new_tr.get_score(), stats.depth

    scores, depths = jax.jit(jax.vmap(one))(traces, step_keys)
    assert scores.shape == (8,)


def test_nuts_vmapped_full_pipeline():
    """Warmup (incl. jit-safe step-size search + mass adaptation) and
    sampling vmapped over chains as one program."""
    @gen
    def model(n):
        mu = gt.normal(0.0, 3.0) @ "mu"
        gt.normal(mu * jnp.ones(n), 1.0) @ "ys"

    obs = choicemap(ys=jnp.full(20, 2.0))
    keys = jax.random.split(KEY, 4)
    traces, _ = jax.vmap(lambda k: model.generate(k, (20,), obs))(keys)
    pipeline = jax.jit(jax.vmap(lambda k, tr: nuts_warmup_and_sample(
        k, tr, select("mu"), num_warmup=100, num_samples=300)[0]))
    samples = pipeline(jax.random.split(jax.random.PRNGKey(1), 4), traces)
    mus = np.asarray(samples)[..., 0]
    assert mus.shape == (4, 300)
    np.testing.assert_allclose(mus.mean(), 1.9890, atol=0.04)


def test_deterministic_translator_weight_exact():
    from gen_tpu.inference import DeterministicTraceTranslator

    @gen
    def model_a():
        gt.gamma(2.0, 1.0) @ "x"

    @gen
    def model_b():
        gt.normal(0.0, 10.0) @ "y"

    @transform
    def log_map(ctx):
        x = ctx.model_in["x"]
        ctx.model_out["y"] = jnp.log(x)

    tr_a = model_a.simulate(KEY, ())
    trans = DeterministicTraceTranslator(model_b, (), gt.ChoiceMap(), log_map)
    new_tr, w = trans(jax.random.PRNGKey(1), tr_a)
    x = float(tr_a["x"])
    expected = (stats.norm.logpdf(np.log(x), 0, 10)
                - stats.gamma.logpdf(x, 2.0) + np.log(1.0 / x))
    np.testing.assert_allclose(float(w), expected, rtol=1e-8)


def test_general_translator_importance_identity():
    """Translating prior samples importance-reweights onto the new model:
    the self-normalized estimate of a target moment must match."""
    from gen_tpu.inference import GeneralTraceTranslator

    @gen
    def radius_model():
        gt.gamma(2.0, 1.0) @ "r"

    @gen
    def point_model():
        gt.normal(0.0, 3.0) @ "px"
        gt.normal(0.0, 3.0) @ "py"

    @gen
    def angle_fwd(tr):
        gt.uniform(0.0, 2 * np.pi) @ "theta"

    @gen
    def null_bwd(tr):
        pass

    @transform
    def polar_to_cart(ctx):
        r = ctx.model_in["r"]
        th = ctx.aux_in["theta"]
        ctx.model_out["px"] = r * jnp.cos(th)
        ctx.model_out["py"] = r * jnp.sin(th)

    gtrans = GeneralTraceTranslator(point_model, (), gt.ChoiceMap(),
                                    angle_fwd, (), null_bwd, (),
                                    polar_to_cart)
    keys = jax.random.split(jax.random.PRNGKey(2), 20000)

    def one(k):
        k1, k2 = jax.random.split(k)
        tra = radius_model.simulate(k1, ())
        ntr, w = gtrans(k2, tra)
        return w, ntr["px"]

    ws, pxs = jax.vmap(one)(keys)
    ws, pxs = np.asarray(ws), np.asarray(pxs)
    wn = np.exp(ws - ws.max())
    wn /= wn.sum()
    est = (wn * pxs ** 2).sum()
    np.testing.assert_allclose(est, 9.0, atol=0.8)


def test_mixture_kernel_under_jit():
    from gen_tpu.inference import mala

    @gen
    def m():
        a = gt.normal(0.0, 1.0) @ "a"
        gt.normal(a, 0.5) @ "y"

    obs = choicemap(y=1.0)
    tr, _ = m.generate(KEY, (), obs)
    mix = mixture([0.5, 0.5],
                  [lambda k, t: mh_selection(k, t, select("a")),
                   lambda k, t: mala(k, t, select("a"), 0.05)])

    def step(t, k):
        t, _ = mix(k, t)
        return t, t["a"]

    final, vals = jax.lax.scan(step, tr,
                               jax.random.split(jax.random.PRNGKey(1), 2500))
    vals = np.asarray(vals)[500:]
    np.testing.assert_allclose(vals.mean(), 0.8, atol=0.06)


def test_chees_hmc():
    """ChEES cross-chain adaptation: posterior-exact on the conjugate
    target; adapts longer trajectories for a correlated target."""
    from gen_tpu.inference import chees_hmc_warmup_and_sample

    @gen
    def model(n):
        mu = gt.normal(0.0, 3.0) @ "mu"
        gt.normal(mu * jnp.ones(n), 1.0) @ "ys"

    obs = choicemap(ys=jnp.full(20, 2.0))
    keys = jax.random.split(KEY, 32)
    traces, _ = jax.vmap(lambda k: model.generate(k, (20,), obs))(keys)
    samples, xs, info = jax.jit(
        lambda k, t: chees_hmc_warmup_and_sample(
            k, t, select("mu"), num_warmup=250, num_samples=300))(
        jax.random.PRNGKey(1), traces)
    s = np.asarray(samples)[100:, :, 0].ravel()
    np.testing.assert_allclose(s.mean(), 1.989, atol=0.03)
    np.testing.assert_allclose(s.std(), 0.223, atol=0.03)
    assert float(info["mean_accept"]) > 0.5


def test_chees_hmc_divergence_safe():
    """Regression test: prior-initialized chains on a heteroscedastic
    regression target diverge during warmup.  Before the NaN-masking fix,
    alpha=0 times a NaN ChEES statistic poisoned the trajectory adaptation
    (log_t=NaN -> n_leap=0 -> identity moves -> accept=1 -> dual averaging
    inflated eps to ~5e15).  Chains stuck in high-curvature prior regions
    are teleported during warmup.  All chains must move and hit the
    least-squares posterior."""
    from gen_tpu.inference import chees_hmc_warmup_and_sample

    n_points = 50
    xvals = jnp.linspace(-3.0, 3.0, n_points)
    rng = np.random.default_rng(0)
    yvals = 0.7 * xvals - 0.4 + 0.5 * jnp.asarray(
        rng.standard_normal(n_points))

    @gen
    def model(x):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        gt.normal(slope * x + intercept, jnp.exp(log_noise)) @ "ys"

    obs = choicemap(ys=yvals)
    sel = select("slope", "intercept", "log_noise")
    keys = jax.random.split(jax.random.PRNGKey(0), 128)
    traces, _ = jax.vmap(lambda k: model.generate(k, (xvals,), obs))(keys)
    samples, _, info = jax.jit(
        lambda k, t: chees_hmc_warmup_and_sample(
            k, t, sel, num_warmup=300, num_samples=200))(
        jax.random.PRNGKey(2), traces)
    eps = float(info["step_size"])
    # with mass adaptation the step size lives in whitened time, where the
    # Gaussian stability limit is ~2 regardless of raw scales
    assert np.isfinite(eps) and 1e-4 < eps < 3.0, eps
    assert int(info["num_leapfrogs"]) >= 1
    s = np.asarray(samples)  # sorted addrs: intercept, log_noise, slope
    assert np.isfinite(s).all()
    moved = s[:, :, 2].std(axis=0) > 0.01
    assert moved.all(), f"{(~moved).sum()} chains never moved"
    A = np.stack([np.asarray(xvals), np.ones(n_points)], 1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(yvals), rcond=None)
    np.testing.assert_allclose(s[50:, :, 2].mean(), coef[0], atol=0.03)
    np.testing.assert_allclose(s[50:, :, 0].mean(), coef[1], atol=0.05)


def test_chees_mass_adaptation_ill_conditioned():
    """Two-phase warmup must estimate the diagonal mass from cross-chain
    variance: on a 400:1-conditioned Gaussian the adapted inverse mass
    matches the true per-coordinate variances and the sampler recovers
    both scales with a SHORT trajectory (identity mass needs trajectories
    ~ condition-number longer — the clipped n_leap cap alone would leave
    the wide coordinate unmixed)."""
    from gen_tpu.inference import chees_hmc_warmup_and_sample

    @gen
    def model():
        gt.normal(0.0, 0.05) @ "a"
        gt.normal(0.0, 20.0) @ "b"

    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    traces, _ = jax.vmap(lambda k: model.generate(k, (), choicemap()))(keys)
    samples, _, info = jax.jit(
        lambda k, t: chees_hmc_warmup_and_sample(
            k, t, select("a", "b"), num_warmup=400, num_samples=400))(
        jax.random.PRNGKey(1), traces)
    inv_mass = np.asarray(info["inv_mass"])
    # true variances (prior = posterior here): [0.0025, 400]
    assert 0.4 < inv_mass[0] / 0.0025 < 2.5, inv_mass
    assert 0.4 < inv_mass[1] / 400.0 < 2.5, inv_mass
    s = np.asarray(samples)[200:]            # (draws, chains, 2)
    np.testing.assert_allclose(s[:, :, 0].std(), 0.05, rtol=0.15)
    np.testing.assert_allclose(s[:, :, 1].std(), 20.0, rtol=0.15)
    assert int(info["num_leapfrogs"]) <= 100
    assert float(info["mean_accept"]) > 0.5
    # legacy single-phase path still available and mass-free
    _, _, info0 = jax.jit(
        lambda k, t: chees_hmc_warmup_and_sample(
            k, t, select("a", "b"), num_warmup=60, num_samples=10,
            adapt_mass=False))(jax.random.PRNGKey(2), traces)
    np.testing.assert_array_equal(np.asarray(info0["inv_mass"]), 1.0)
