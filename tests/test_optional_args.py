"""Optional/default arguments on @gen functions (reference:
test/optional_args.jl, 217 LoC; filling contract documented at
gen_fn_interface.jl:310-318 — omitted trailing args are overwritten with
the declared defaults in update/regenerate)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

import gen_tpu as gt
from gen_tpu import choicemap, gen, select

KEY = jax.random.PRNGKey(0)


@gen
def model(x, scale=2.0, shift=0.5):
    return gt.normal(x + shift, scale) @ "v"


def N(v, mu, std):
    return stats.norm.logpdf(float(v), mu, std)


def test_simulate_fills_defaults():
    tr = model.simulate(KEY, (1.0,))
    assert tr.get_args() == (1.0, 2.0, 0.5)
    np.testing.assert_allclose(float(tr.get_score()),
                               N(tr["v"], 1.5, 2.0), rtol=1e-12)
    tr2 = model.simulate(KEY, (1.0, 3.0))
    assert tr2.get_args() == (1.0, 3.0, 0.5)


def test_generate_and_assess_fill_defaults():
    tr, w = model.generate(KEY, (0.0,), choicemap(v=1.2))
    np.testing.assert_allclose(float(w), N(1.2, 0.5, 2.0), rtol=1e-12)
    w2, _ = model.assess((0.0,), choicemap(v=1.2))
    np.testing.assert_allclose(float(w2), float(w), rtol=1e-12)


def test_update_overwrites_with_default():
    tr, _ = model.generate(KEY, (0.0, 5.0), choicemap(v=1.2))
    # omit the optional args: the update must re-score under the DEFAULTS
    new_tr, w, _, _ = model.update(None, tr, (0.0,),
                                   (gt.NoChange,), choicemap())
    assert new_tr.get_args() == (0.0, 2.0, 0.5)
    np.testing.assert_allclose(
        float(w), N(1.2, 0.5, 2.0) - N(1.2, 0.5, 5.0), rtol=1e-12)


def test_regenerate_with_defaults():
    tr, _ = model.generate(KEY, (0.0,), choicemap(v=1.2))
    new_tr, w, _ = model.regenerate(jax.random.PRNGKey(1), tr, (0.0, 4.0),
                                    (gt.NoChange, gt.UnknownChange),
                                    select("nothing"))
    assert new_tr.get_args() == (0.0, 4.0, 0.5)
    np.testing.assert_allclose(
        float(w), N(1.2, 0.5, 4.0) - N(1.2, 0.5, 2.0), rtol=1e-12)


def test_defaults_under_jit_and_vmap():
    def run(k):
        tr = model.simulate(k, (1.0,))
        return tr.get_score()

    scores = jax.jit(jax.vmap(run))(jax.random.split(KEY, 8))
    assert np.isfinite(np.asarray(scores)).all()


def test_variadic_body_unaffected():
    @gen
    def varmodel(*xs):
        return gt.normal(sum(xs), 1.0) @ "v"

    tr = varmodel.simulate(KEY, (1.0, 2.0))
    assert tr.get_args() == (1.0, 2.0)
