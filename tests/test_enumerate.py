"""Exact enumerative inference: grid-vmapped assess vs hand-computed
posteriors, then used as the oracle for a sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import enumerate_marginals, enumerate_posterior

KEY = jax.random.PRNGKey(0)


@gen
def two_coins():
    a = gt.bernoulli(0.3) @ "a"
    b = gt.bernoulli(0.6) @ "b"
    p = jnp.where(a & b, 0.9, jnp.where(a | b, 0.5, 0.1))
    gt.bernoulli(p) @ "y"


def _hand_posterior(y):
    post = {}
    total = 0.0
    for a in (0, 1):
        for b in (0, 1):
            pa = 0.3 if a else 0.7
            pb = 0.6 if b else 0.4
            p = 0.9 if (a and b) else (0.5 if (a or b) else 0.1)
            py = p if y else 1 - p
            post[(a, b)] = pa * pb * py
            total += pa * pb * py
    return {k: v / total for k, v in post.items()}, np.log(total)


def test_enumerate_matches_hand_computation():
    obs = choicemap(y=True)
    sup = {"a": jnp.asarray([False, True]), "b": jnp.asarray([False, True])}
    grid, log_joint, log_ml, log_post = enumerate_posterior(
        two_coins, (), obs, sup)
    hand, hand_lml = _hand_posterior(1)
    np.testing.assert_allclose(float(log_ml), hand_lml, rtol=1e-12)
    post = np.exp(np.asarray(log_post))
    a_col = np.asarray(grid[("a",)]).astype(int)
    b_col = np.asarray(grid[("b",)]).astype(int)
    for g in range(4):
        np.testing.assert_allclose(post[g], hand[(a_col[g], b_col[g])],
                                   rtol=1e-10)


def test_enumerate_marginals():
    obs = choicemap(y=True)
    sup = {"a": jnp.asarray([False, True]), "b": jnp.asarray([False, True])}
    marg, log_ml = enumerate_marginals(two_coins, (), obs, sup)
    hand, _ = _hand_posterior(1)
    pa1 = hand[(1, 0)] + hand[(1, 1)]
    pb1 = hand[(0, 1)] + hand[(1, 1)]
    np.testing.assert_allclose(float(marg[("a",)][1]), pa1, rtol=1e-10)
    np.testing.assert_allclose(float(marg[("b",)][1]), pb1, rtol=1e-10)


@gen
def cat_model():
    k = gt.uniform_discrete(0, 4) @ "k"
    gt.normal(1.0 * k, 0.7) @ "y"


def test_enumeration_is_the_oracle_for_mh():
    """Selection-MH over a discrete latent converges to the enumerated
    posterior."""
    obs = choicemap(y=2.3)
    sup = {"k": jnp.arange(5)}
    marg, _ = enumerate_marginals(cat_model, (), obs, sup)
    exact = np.asarray(marg[("k",)])

    from gen_tpu.inference import mh
    tr, _ = cat_model.generate(KEY, (), obs)
    sel = select("k")

    def step(tr, k):
        new_tr, acc = mh(k, tr, sel)
        return new_tr, new_tr.get_choices()["k"]

    _, ks = jax.lax.scan(step, tr,
                         jax.random.split(jax.random.PRNGKey(1), 20000))
    ks = np.asarray(ks)[2000:]
    emp = np.bincount(ks.astype(int), minlength=5) / len(ks)
    np.testing.assert_allclose(emp, exact, atol=0.02)
