"""HMM model family: forward/smoother/FFBS against brute-force enumeration
over all state paths (the exact oracle for the oracle), collapsed
distribution GFI parity, and gradient checks through the forward scan."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gen_tpu as gt
from gen_tpu.models import (HMMParams, hmm, hmm_ffbs, hmm_forward,
                            hmm_kernel, hmm_smoother)

KEY = jax.random.PRNGKey(0)

K, V, T = 3, 4, 6
RNG = np.random.default_rng(0)


def _rand_params(seed=0):
    rng = np.random.default_rng(seed)
    init = rng.dirichlet(np.ones(K))
    trans = rng.dirichlet(np.ones(K), size=K)
    emit = rng.dirichlet(np.ones(V), size=K)
    return HMMParams(jnp.asarray(init), jnp.asarray(trans),
                     jnp.asarray(emit))


PARAMS = _rand_params()
YS = jnp.asarray(RNG.integers(0, V, T))


def _joint_prob(zs, ys, params):
    init, trans, emit = (np.asarray(p) for p in params)
    p = init[zs[0]] * emit[zs[0], ys[0]]
    for t in range(1, len(ys)):
        p *= trans[zs[t - 1], zs[t]] * emit[zs[t], ys[t]]
    return p


def _enumerate(ys, params):
    """Brute-force marginal likelihood + posterior marginals."""
    total = 0.0
    marg = np.zeros((len(ys), K))
    joint = {}
    for zs in itertools.product(range(K), repeat=len(ys)):
        p = _joint_prob(zs, np.asarray(ys), params)
        total += p
        joint[zs] = p
        for t, z in enumerate(zs):
            marg[t, z] += p
    return np.log(total), marg / total, {z: p / total
                                         for z, p in joint.items()}


EXACT_LML, EXACT_MARG, EXACT_POST = _enumerate(YS, PARAMS)


def test_forward_log_ml_matches_enumeration():
    lml, log_alpha = hmm_forward(PARAMS, YS)
    np.testing.assert_allclose(float(lml), EXACT_LML, rtol=1e-10)
    # filtered posterior at the last step == smoothed at last step
    filt_last = np.exp(np.asarray(log_alpha[-1]) - float(lml))
    np.testing.assert_allclose(filt_last, EXACT_MARG[-1], rtol=1e-8)


def test_smoother_matches_enumeration():
    post = hmm_smoother(PARAMS, YS)
    np.testing.assert_allclose(np.asarray(post), EXACT_MARG, rtol=1e-8,
                               atol=1e-12)


def test_ffbs_samples_exact_posterior():
    """Empirical path frequencies of FFBS draws match the enumerated joint
    posterior (chi-square-free: direct frequency comparison at n=40000)."""
    n = 40000
    draws = jax.vmap(lambda k: hmm_ffbs(k, PARAMS, YS))(
        jax.random.split(jax.random.PRNGKey(2), n))
    draws = np.asarray(draws)
    # compare the 10 most probable paths' frequencies
    top = sorted(EXACT_POST.items(), key=lambda kv: -kv[1])[:10]
    for zs, p in top:
        freq = np.mean(np.all(draws == np.asarray(zs), axis=1))
        assert abs(freq - p) < 4 * np.sqrt(p * (1 - p) / n) + 1e-3, (zs, p,
                                                                     freq)


def test_collapsed_hmm_distribution_gfi():
    dist = hmm(T)
    lp = dist.logpdf(YS, *PARAMS)
    np.testing.assert_allclose(float(lp), EXACT_LML, rtol=1e-10)

    @gt.gen
    def model(init, trans, emit):
        dist(init, trans, emit) @ "ys"

    tr, w = model.generate(KEY, tuple(PARAMS), gt.choicemap(ys=YS))
    np.testing.assert_allclose(float(w), EXACT_LML, rtol=1e-10)
    tr2 = model.simulate(jax.random.PRNGKey(3), tuple(PARAMS))
    lp2 = dist.logpdf(tr2.get_choices()["ys"], *PARAMS)
    np.testing.assert_allclose(float(tr2.get_score()), float(lp2),
                               rtol=1e-10)


def test_forward_gradients_finite_diff():
    """d log-ML / d trans via jax.grad vs central differences (the EM /
    Baum-Welch gradient)."""
    def f(tr):
        return hmm_forward(PARAMS._replace(trans=tr), YS)[0]

    g = np.asarray(jax.grad(f)(PARAMS.trans))
    dx = 1e-6
    tr_np = np.asarray(PARAMS.trans)
    for i in range(K):
        for j in range(K):
            tp, tm = tr_np.copy(), tr_np.copy()
            tp[i, j] += dx
            tm[i, j] -= dx
            fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (
                2 * dx)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-4, atol=1e-7)


def test_smc_over_hmm_kernel_matches_forward():
    from gen_tpu.inference.smc import smc_genealogy
    obs = gt.vector_choicemap(T, y=YS)
    lmls = []
    for s in range(3):
        _, _, _, lml = smc_genealogy(jax.random.PRNGKey(s), hmm_kernel,
                                     jnp.asarray(0), tuple(PARAMS), obs,
                                     4096)
        lmls.append(float(lml))
    assert abs(np.mean(lmls) - EXACT_LML) < 0.05, (lmls, EXACT_LML)


def test_batched_scaled_forward_matches_log_space():
    from gen_tpu.models import hmm_forward_batched
    n = 8
    ys_batch = jnp.asarray(RNG.integers(0, V, (n, T)))
    lmls, filtered = hmm_forward_batched(PARAMS, ys_batch)
    for i in range(n):
        lml_i, log_alpha = hmm_forward(PARAMS, ys_batch[i])
        np.testing.assert_allclose(float(lmls[i]), float(lml_i), rtol=1e-9)
        # filtered posteriors match the normalized log-space potentials
        filt = np.exp(np.asarray(log_alpha)
                      - np.asarray(jax.scipy.special.logsumexp(
                          log_alpha, axis=1, keepdims=True)))
        np.testing.assert_allclose(np.asarray(filtered[:, i]), filt,
                                   rtol=1e-7, atol=1e-10)


def test_batched_forward_bf16_close():
    from gen_tpu.models import hmm_forward_batched
    n = 16
    ys_batch = jnp.asarray(RNG.integers(0, V, (n, T)))
    f32, _ = hmm_forward_batched(PARAMS, ys_batch)
    bf16, _ = hmm_forward_batched(PARAMS, ys_batch, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=0.1)
