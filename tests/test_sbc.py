"""SBC: a correct inference procedure (exact conjugate sampler, and real
HMC) yields uniform ranks; a deliberately biased sampler is detected."""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import gen, select
from gen_tpu.inference import hmc, sbc_ranks, sbc_uniformity

N_OBS, SIGMA, PRIOR_STD = 8, 1.0, 2.0


@gen
def model():
    mu = gt.normal(0.0, PRIOR_STD) @ "mu"
    gt.normal(mu * jnp.ones(N_OBS), SIGMA) @ "ys"


OBS_SEL = select("ys")
L = 63


def exact_sampler(bias=0.0, scale=1.0):
    def run(key, obs):
        ys = obs.get_value("ys")
        prec = 1 / PRIOR_STD ** 2 + N_OBS / SIGMA ** 2
        mean = (jnp.sum(ys) / SIGMA ** 2) / prec + bias
        sd = scale / jnp.sqrt(prec)
        return (mean + sd * jax.random.normal(key, (L,)))[:, None]
    return run


def test_exact_sampler_is_calibrated():
    ranks, l = sbc_ranks(jax.random.PRNGKey(0), model, (), OBS_SEL,
                         exact_sampler(), num_trials=600)
    assert l == L and ranks.shape == (600, 1)
    _, _, pval = sbc_uniformity(ranks, l)
    assert pval[0] > 0.01, pval


def test_biased_mean_detected():
    ranks, l = sbc_ranks(jax.random.PRNGKey(1), model, (), OBS_SEL,
                         exact_sampler(bias=0.3), num_trials=600)
    _, _, pval = sbc_uniformity(ranks, l)
    assert pval[0] < 1e-4, pval


def test_underdispersed_detected():
    ranks, l = sbc_ranks(jax.random.PRNGKey(2), model, (), OBS_SEL,
                         exact_sampler(scale=0.6), num_trials=600)
    _, _, pval = sbc_uniformity(ranks, l)
    assert pval[0] < 1e-4, pval


def test_hmc_pipeline_is_calibrated():
    """Real HMC chain through the GFI: thinned ranks must be uniform."""
    def run(key, obs):
        k0, k1 = jax.random.split(key)
        tr, _ = model.generate(k0, (), obs)

        def step(t, k):
            t, _ = hmc(k, t, select("mu"), L=8, eps=0.25)
            return t, t["mu"]

        _, mus = jax.lax.scan(step, tr, jax.random.split(k1, 64 + 16))
        return mus[16:][:, None]   # burn 16, keep 64

    ranks, l = sbc_ranks(jax.random.PRNGKey(3), model, (), OBS_SEL, run,
                         num_trials=400, thin=4)
    assert l == 16
    _, _, pval = sbc_uniformity(ranks, l, num_bins=8)
    assert pval[0] > 0.01, pval


def test_nuts_pipeline_is_calibrated():
    """NUTS through the GFI: SBC ranks must be uniform. (End-to-end
    calibration check; the SENSITIVE guard for U-turn-scheme bugs is the
    variance-exactness test in test_nuts_fsm.py — the rank chi-square has
    limited power against the few-percent distortions those produce. Step
    size must stay below the leapfrog stability limit 2*posterior_sd ~
    0.70 here, or chains freeze at their init and SBC fails for the
    uninteresting reason.)"""
    from gen_tpu.inference import nuts

    def run(key, obs):
        k0, k1 = jax.random.split(key)
        tr, _ = model.generate(k0, (), obs)

        def step(t, k):
            t, _ = nuts(k, t, select("mu"), step_size=0.4, max_depth=5)
            return t, t["mu"]

        _, mus = jax.lax.scan(step, tr, jax.random.split(k1, 80))
        return mus[16:][:, None]

    ranks, l = sbc_ranks(jax.random.PRNGKey(5), model, (), OBS_SEL, run,
                         num_trials=400, thin=4)
    _, _, pval = sbc_uniformity(ranks, l, num_bins=8)
    assert pval[0] > 0.01, pval
