"""Tempering methods (AIS / tempered SMC / parallel tempering) against
exact conjugate-Gaussian evidence and a bimodal posterior that defeats
single-chain HMC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import ais, smc_sampler, parallel_tempering

KEY = jax.random.PRNGKey(0)

N_OBS = 20
SIGMA0, SIGMA = 3.0, 1.0
YS = jnp.asarray(np.random.default_rng(1).normal(2.0, SIGMA, N_OBS))


@gen
def gauss_model():
    mu = gt.normal(0.0, SIGMA0) @ "mu"
    gt.normal(mu * jnp.ones(N_OBS), SIGMA) @ "ys"


def exact_log_evidence():
    """ys ~ N(0, SIGMA0^2 * 11^T + SIGMA^2 I) marginally."""
    cov = SIGMA0 ** 2 * np.ones((N_OBS, N_OBS)) + SIGMA ** 2 * np.eye(N_OBS)
    d = np.asarray(YS)
    chol = np.linalg.cholesky(cov)
    z = np.linalg.solve(chol, d)
    return float(-0.5 * (z @ z + N_OBS * np.log(2 * np.pi))
                 - np.sum(np.log(np.diag(chol))))


def exact_posterior():
    prec = 1 / SIGMA0 ** 2 + N_OBS / SIGMA ** 2
    mean = (np.sum(np.asarray(YS)) / SIGMA ** 2) / prec
    return mean, 1 / np.sqrt(prec)


OBS = choicemap(ys=YS)
SEL = select("mu")


def _template_trace():
    tr, _ = gauss_model.generate(KEY, (), OBS)
    return tr


def test_ais_log_ml_matches_exact_evidence():
    tr = _template_trace()
    betas = jnp.linspace(0.0, 1.0, 21)[1:]
    run = jax.jit(lambda k: ais(k, tr, SEL, betas, n_particles=512,
                                L=5, eps=0.1))
    lmls = [float(run(jax.random.PRNGKey(s))[2]) for s in range(3)]
    exact = exact_log_evidence()
    assert abs(np.mean(lmls) - exact) < 0.1, (lmls, exact)


def test_smc_sampler_log_ml_and_posterior():
    tr = _template_trace()
    betas = jnp.linspace(0.0, 1.0, 21)[1:]
    flats, log_w, lml = jax.jit(
        lambda k: smc_sampler(k, tr, SEL, betas, n_particles=1024,
                              L=5, eps=0.1, moves_per_rung=2))(
        jax.random.PRNGKey(3))
    exact = exact_log_evidence()
    assert abs(float(lml) - exact) < 0.1, (float(lml), exact)
    # weighted posterior moments
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w = w / w.sum()
    mus = np.asarray(flats)[:, 0]
    mean, std = exact_posterior()
    assert abs(np.sum(w * mus) - mean) < 0.05
    emp_var = np.sum(w * (mus - np.sum(w * mus)) ** 2)
    assert abs(np.sqrt(emp_var) - std) < 0.05


@gen
def bimodal_model():
    x = gt.normal(0.0, 3.0) @ "x"
    gt.normal(x * x, 0.5) @ "y"


def test_parallel_tempering_visits_both_modes():
    """Posterior of x given y=4 is bimodal at x = ±2; a beta=1 HMC chain
    started in one mode stays there, replica exchange crosses."""
    obs = choicemap(y=4.0)
    tr, _ = bimodal_model.generate(KEY, (), obs)
    sel = select("x")
    betas = jnp.asarray([0.02, 0.06, 0.15, 0.35, 0.65, 1.0])
    samples, swap_rate = jax.jit(
        lambda k: parallel_tempering(k, tr, sel, betas, n_sweeps=3000,
                                     L=8, eps=0.15))(jax.random.PRNGKey(5))
    xs = np.asarray(samples)[500:, 0]
    assert float(swap_rate) > 0.2
    frac_pos = np.mean(xs > 0)
    assert 0.2 < frac_pos < 0.8, frac_pos          # both modes visited
    assert abs(np.mean(np.abs(xs)) - 2.0) < 0.15   # modes at ±2


def test_single_chain_hmc_stays_in_one_mode():
    """Control for the PT test: the same budget of beta=1 HMC moves does
    NOT cross between modes (validates that PT is doing the work)."""
    from gen_tpu.inference.tempering import TemperedTarget, _tempered_hmc_step
    obs = choicemap(y=4.0)
    tr, _ = bimodal_model.generate(KEY, (), obs)
    target = TemperedTarget(tr, select("x"))

    def step(flat, k):
        new, _ = _tempered_hmc_step(k, flat, target, 1.0, 8, 0.15)
        return new, new

    _, hist = jax.lax.scan(step, jnp.asarray([2.0]),
                           jax.random.split(jax.random.PRNGKey(6), 3000))
    xs = np.asarray(hist)[:, 0]
    assert np.mean(xs > 0) > 0.99  # stuck in the x=+2 mode


def test_ais_prior_only_ladder_gives_zero_lik_weight():
    """Degenerate ladder sanity: with betas=[1.0] and no moves, AIS reduces
    to simple importance sampling from the prior (weights = loglik)."""
    tr = _template_trace()
    from gen_tpu.inference import importance_sampling
    flats, log_w, lml = ais(jax.random.PRNGKey(7), tr, SEL,
                            jnp.asarray([1.0]), n_particles=20000,
                            L=1, eps=0.0)
    _, _, lml_is = importance_sampling(jax.random.PRNGKey(8), gauss_model,
                                       (), OBS, 20000)
    assert abs(float(lml) - float(lml_is)) < 0.2


def test_adaptive_smc_sampler():
    """ESS-adaptive ladder: evidence matches exact, ladder is monotone
    increasing and terminates at beta=1."""
    from gen_tpu.inference import smc_sampler_adaptive
    tr = _template_trace()
    flats, lml, n_stages, betas = jax.jit(
        lambda k: smc_sampler_adaptive(k, tr, SEL, n_particles=1024,
                                       target_ess=0.6, L=5, eps=0.1,
                                       moves_per_rung=2))(
        jax.random.PRNGKey(9))
    exact = exact_log_evidence()
    assert abs(float(lml) - exact) < 0.15, (float(lml), exact)
    ns = int(n_stages)
    assert 1 <= ns < 64
    bs = np.asarray(betas)[:ns]
    assert np.all(np.diff(bs) > 0) if ns > 1 else True
    assert bs[-1] == pytest.approx(1.0)
    # equally-weighted particles estimate the exact posterior moments
    mean, std = exact_posterior()
    mus = np.asarray(flats)[:, 0]
    assert abs(mus.mean() - mean) < 0.05
    assert abs(mus.std() - std) < 0.05


def test_sharded_smc_sampler_matches_exact_evidence():
    """Particle-sharded tempered SMC on the 8-device mesh recovers the
    exact conjugate evidence."""
    from gen_tpu.parallel import chain_mesh, sharded_smc_sampler
    tr = _template_trace()
    betas = jnp.linspace(0.0, 1.0, 21)[1:]
    mesh = chain_mesh(8, axis="particles")
    flats, log_w, lml = sharded_smc_sampler(
        jax.random.PRNGKey(11), tr, SEL, betas, 1024, mesh,
        L=5, eps=0.1, moves_per_rung=2)
    exact = exact_log_evidence()
    assert abs(float(lml) - exact) < 0.15, (float(lml), exact)
    assert flats.shape == (1024, 1)
    mean, std = exact_posterior()
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w = w / w.sum()
    mus = np.asarray(flats)[:, 0]
    assert abs(np.sum(w * mus) - mean) < 0.06
