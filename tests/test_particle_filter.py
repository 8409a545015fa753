"""Particle filter vs an exact HMM forward algorithm (reference:
test/inference/particle_filter.jl:1-170)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import Unfold, choicemap, gen
from gen_tpu.diff import IntDiff, NoChange
from gen_tpu.inference import (effective_sample_size,
                               initialize_particle_filter, log_ml_estimate,
                               maybe_resample, particle_filter_step,
                               sample_unweighted_traces)

KEY = jax.random.PRNGKey(0)

# discrete HMM: 2 latent states, 2 observation symbols
TRANS = np.array([[0.7, 0.3], [0.2, 0.8]])
EMIT = np.array([[0.9, 0.1], [0.4, 0.6]])
INIT = np.array([0.6, 0.4])


@gen
def hmm_kernel(t, prev_z):
    probs = jnp.where(t == 0, jnp.asarray(INIT),
                      jnp.asarray(TRANS)[prev_z])
    z = gt.categorical(probs) @ "z"
    gt.categorical(jnp.asarray(EMIT)[z]) @ "y"
    return z


hmm = Unfold(hmm_kernel)


def exact_log_ml(obs):
    """Classic forward algorithm."""
    alpha = INIT * EMIT[:, obs[0]]
    log_ml = 0.0
    for t in range(1, len(obs)):
        s = alpha.sum()
        log_ml += np.log(s)
        alpha = (alpha / s) @ TRANS * EMIT[:, obs[t]]
    log_ml += np.log(alpha.sum())
    return log_ml


OBS_SEQ = [0, 0, 1, 1, 0, 1, 0, 0]


def _obs_at(t):
    c = gt.ChoiceMap()
    c.set_value((t, "y"), OBS_SEQ[t])
    return c


def test_pf_log_ml_matches_forward_algorithm():
    n = 3000
    key = KEY
    key, k0 = jax.random.split(key)
    state = initialize_particle_filter(
        k0, hmm, (1, 0), _obs_at(0), n)
    for t in range(1, len(OBS_SEQ)):
        key, kr, ks = jax.random.split(key, 3)
        state, _ = maybe_resample(kr, state, ess_threshold=n / 2)
        state = particle_filter_step(
            ks, state, (t + 1, 0), (IntDiff(1), NoChange), _obs_at(t))
    lml = float(log_ml_estimate(state))
    exact = exact_log_ml(OBS_SEQ)
    np.testing.assert_allclose(lml, exact, atol=0.05)


def test_pf_systematic_vs_multinomial():
    n = 2000
    for method in ("systematic", "multinomial", "residual"):
        key = jax.random.PRNGKey(7)
        key, k0 = jax.random.split(key)
        state = initialize_particle_filter(k0, hmm, (1, 0), _obs_at(0), n)
        for t in range(1, len(OBS_SEQ)):
            key, kr, ks = jax.random.split(key, 3)
            state, _ = maybe_resample(kr, state, method=method)
            state = particle_filter_step(
                ks, state, (t + 1, 0), (IntDiff(1), NoChange), _obs_at(t))
        np.testing.assert_allclose(float(log_ml_estimate(state)),
                                   exact_log_ml(OBS_SEQ), atol=0.08,
                                   err_msg=method)


def test_ess():
    lnw = jnp.log(jnp.ones(10) / 10)
    np.testing.assert_allclose(effective_sample_size(lnw), 10.0, rtol=1e-6)
    lnw2 = jnp.log(jnp.array([1.0 - 1e-9] + [1e-9 / 9] * 9))
    np.testing.assert_allclose(effective_sample_size(lnw2), 1.0, rtol=1e-5)


def test_maybe_resample_skips_when_ess_high():
    n = 100
    state = initialize_particle_filter(KEY, hmm, (1, 0), _obs_at(0), n)
    # equal-ish weights: threshold 1 -> no resample
    new_state, did = maybe_resample(jax.random.PRNGKey(1), state,
                                    ess_threshold=1.0)
    assert not bool(did)
    np.testing.assert_allclose(np.asarray(new_state.log_weights),
                               np.asarray(state.log_weights))


def test_sample_unweighted_traces():
    n = 500
    state = initialize_particle_filter(KEY, hmm, (1, 0), _obs_at(0), n)
    out = sample_unweighted_traces(jax.random.PRNGKey(2), state, 7)
    assert out.get_score().shape == (7,)


def test_pf_custom_proposal_step():
    """Propose the next latent from the exact filtering distribution."""
    @gen
    def smart_prop(tr, t):
        # propose z_t proportional to transition * emission likelihood
        prev_z = tr[(t - 1, "z")]
        probs = jnp.asarray(TRANS)[prev_z] * jnp.asarray(EMIT)[:, OBS_SEQ[t]]
        c = gt.ChoiceMap()
        z = gt.categorical(probs / jnp.sum(probs)) @ (t, "z")
        return z

    n = 1500
    key, k0 = jax.random.split(KEY)
    state = initialize_particle_filter(k0, hmm, (1, 0), _obs_at(0), n)
    for t in range(1, len(OBS_SEQ)):
        key, kr, ks = jax.random.split(key, 3)
        state, _ = maybe_resample(kr, state)
        state = particle_filter_step(
            ks, state, (t + 1, 0), (IntDiff(1), NoChange), _obs_at(t),
            proposal=smart_prop, proposal_args=(t,))
    np.testing.assert_allclose(float(log_ml_estimate(state)),
                               exact_log_ml(OBS_SEQ), atol=0.05)
