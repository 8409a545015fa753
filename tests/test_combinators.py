"""Map/Unfold/choice_at/call_at/mixture tests with exact weight arithmetic
(reference: test/modeling_library/map.jl, unfold.jl, choice_at.jl,
call_at.jl, mixture.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gen_tpu as gt
from gen_tpu import (Map, Unfold, choicemap, choice_at, call_at, gen, select,
                     vector_choicemap)
from gen_tpu.combinators import VectorChoiceMap

KEY = jax.random.PRNGKey(0)


@gen
def kernel_fn(x):
    y = gt.normal(x, 1.0) @ "y"
    return y


mapped = Map(kernel_fn)


def N(x, mu, std):
    return stats.norm.logpdf(np.asarray(x, dtype=float), mu, std)


class TestMap:
    def test_simulate(self):
        xs = jnp.array([0.0, 1.0, 2.0])
        tr = mapped.simulate(KEY, (xs,))
        ys = np.asarray(tr.get_retval())
        assert ys.shape == (3,)
        np.testing.assert_allclose(
            tr.get_score(), sum(N(ys[i], float(xs[i]), 1.0) for i in range(3)),
            rtol=1e-12)
        # choices under integer keys
        np.testing.assert_allclose(tr.get_choices()[(1, "y")], ys[1])

    def test_generate_dense(self):
        xs = jnp.array([0.0, 1.0])
        cons = vector_choicemap(2, y=jnp.array([0.5, 1.5]))
        tr, w = mapped.generate(KEY, (xs,), cons)
        np.testing.assert_allclose(w, N(0.5, 0, 1) + N(1.5, 1, 1), rtol=1e-12)

    def test_generate_sparse(self):
        xs = jnp.array([0.0, 1.0, 2.0])
        cons = choicemap()
        cons.set_value((1, "y"), 7.0)
        tr, w = mapped.generate(KEY, (xs,), cons)
        np.testing.assert_allclose(w, N(7.0, 1.0, 1.0), rtol=1e-12)
        np.testing.assert_allclose(tr.get_choices()[(1, "y")], 7.0)

    def test_update(self):
        xs = jnp.array([0.0, 1.0])
        cons = vector_choicemap(2, y=jnp.array([0.5, 1.5]))
        tr, _ = mapped.generate(KEY, (xs,), cons)
        new_cons = choicemap()
        new_cons.set_value((0, "y"), 2.0)
        new_tr, w, _, discard = mapped.update(
            KEY, tr, (xs,), (gt.UnknownChange,), new_cons)
        np.testing.assert_allclose(w, N(2.0, 0, 1) - N(0.5, 0, 1), rtol=1e-12)
        np.testing.assert_allclose(discard[(0, "y")], 0.5)
        np.testing.assert_allclose(new_tr.get_choices()[(1, "y")], 1.5)

    def test_regenerate_element_varying_selection(self):
        """Per-element selections lower onto one batched MaskedSelection
        (one vmap, no per-element Python loop); exact semantics: selected
        elements resample from the prior (weight 0 for a Map of
        independent kernels), unselected retained."""
        xs = jnp.array([0.0, 1.0, 2.0, 3.0])
        tr = mapped.simulate(KEY, (xs,))
        sel = select((1, "y"), (3, "y"))
        new_tr, w, _ = mapped.regenerate(jax.random.PRNGKey(2), tr, (xs,),
                                         (gt.UnknownChange,), sel)
        # independent applications: regenerate weight is exactly 0
        np.testing.assert_allclose(float(w), 0.0, atol=1e-12)
        for i in (0, 2):
            np.testing.assert_allclose(
                float(new_tr.get_choices()[(i, "y")]),
                float(tr.get_choices()[(i, "y")]), rtol=1e-12)
        for i in (1, 3):
            assert (float(new_tr.get_choices()[(i, "y")])
                    != pytest.approx(float(tr.get_choices()[(i, "y")])))
        # score identity
        lhs = float(new_tr.get_score()) - float(tr.get_score())
        rhs = float(w) + float(new_tr.project(sel)) - float(tr.project(sel))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9, atol=1e-9)

    def test_regenerate_uniform_hierarchical_selection(self):
        """A uniform per-element selection takes the shared vmapped path and
        equals selecting everything (single-address kernel)."""
        xs = jnp.array([0.0, 1.0])
        tr = mapped.simulate(KEY, (xs,))
        sel = select((0, "y"), (1, "y"))
        new_tr, w, _ = mapped.regenerate(jax.random.PRNGKey(3), tr, (xs,),
                                         (gt.UnknownChange,), sel)
        np.testing.assert_allclose(float(w), 0.0, atol=1e-12)
        for i in (0, 1):
            assert (float(new_tr.get_choices()[(i, "y")])
                    != pytest.approx(float(tr.get_choices()[(i, "y")])))

    def test_update_grow(self):
        xs2 = jnp.array([0.0, 1.0])
        xs3 = jnp.array([0.0, 1.0, 2.0])
        cons = vector_choicemap(2, y=jnp.array([0.5, 1.5]))
        tr, _ = mapped.generate(KEY, (xs2,), cons)
        new_tr, w, _, _ = mapped.update(
            KEY, tr, (xs3,), (gt.UnknownChange,), choicemap())
        assert new_tr.length == 3
        np.testing.assert_allclose(w, 0.0, atol=1e-12)  # fresh element free

    def test_update_shrink(self):
        xs3 = jnp.array([0.0, 1.0, 2.0])
        xs2 = jnp.array([0.0, 1.0])
        cons = vector_choicemap(3, y=jnp.array([0.5, 1.5, 2.5]))
        tr, _ = mapped.generate(KEY, (xs3,), cons)
        new_tr, w, _, discard = mapped.update(
            KEY, tr, (xs2,), (gt.UnknownChange,), choicemap())
        np.testing.assert_allclose(w, -N(2.5, 2.0, 1.0), rtol=1e-12)
        np.testing.assert_allclose(discard[(2, "y")], 2.5)

    def test_regenerate_all(self):
        xs = jnp.array([0.0, 1.0])
        cons = vector_choicemap(2, y=jnp.array([0.5, 1.5]))
        tr, _ = mapped.generate(KEY, (xs,), cons)
        new_tr, w, _ = mapped.regenerate(
            jax.random.PRNGKey(3), tr, (xs,), (gt.UnknownChange,), gt.ALL)
        np.testing.assert_allclose(w, 0.0, atol=1e-12)
        assert not np.allclose(np.asarray(new_tr.get_retval()),
                               np.asarray(tr.get_retval()))

    def test_assess_and_gradients(self):
        xs = jnp.array([0.0, 1.0])
        ys = jnp.array([0.5, 1.5])
        w, rv = mapped.assess((xs,), vector_choicemap(2, y=ys))
        np.testing.assert_allclose(w, N(0.5, 0, 1) + N(1.5, 1, 1), rtol=1e-12)
        tr, _ = mapped.generate(KEY, (xs,), vector_choicemap(2, y=ys))
        _, vals, grads = mapped.choice_gradients(tr, gt.ALL)
        # d/dy logN(y; x, 1) = -(y - x)
        np.testing.assert_allclose(np.asarray(grads[(0, "y")]), -0.5, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(grads[(1, "y")]), -0.5, rtol=1e-8)

    def test_inside_model(self):
        @gen
        def parent():
            xs = jnp.array([0.0, 2.0])
            ys = mapped(xs) @ "m"
            return jnp.sum(ys)

        tr = parent.simulate(KEY, ())
        ys = np.asarray(tr[("m", 0)]), np.asarray(tr[("m", 1)])
        np.testing.assert_allclose(
            tr.get_score(), N(ys[0], 0, 1) + N(ys[1], 2, 1), rtol=1e-12)


@gen
def chain_kernel(t, prev):
    x = gt.normal(prev, 1.0) @ "x"
    return x


chain = Unfold(chain_kernel)


class TestUnfold:
    def test_simulate(self):
        tr = chain.simulate(KEY, (4, 0.0))
        xs = np.asarray(tr.get_retval())
        assert xs.shape == (4,)
        expected = N(xs[0], 0, 1) + sum(
            N(xs[t], xs[t - 1], 1) for t in range(1, 4))
        np.testing.assert_allclose(tr.get_score(), expected, rtol=1e-12)
        np.testing.assert_allclose(tr.get_choices()[(2, "x")], xs[2])

    def test_generate_dense(self):
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, w = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        expected = N(1, 0, 1) + N(2, 1, 1) + N(3, 2, 1)
        np.testing.assert_allclose(w, expected, rtol=1e-12)
        np.testing.assert_allclose(tr.get_score(), expected, rtol=1e-12)

    def test_generate_sparse(self):
        cons = choicemap()
        cons.set_value((1, "x"), 5.0)
        tr, w = chain.generate(KEY, (3, 0.0), cons)
        x0 = float(tr[(0, "x")])
        np.testing.assert_allclose(w, N(5.0, x0, 1.0), rtol=1e-12)

    def test_regenerate_step_varying_selection(self):
        """Per-step selections scan with a batched MaskedSelection; weight
        follows the chain rule: resampling x_1 rescopes x_2 | x_1."""
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, _ = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        sel = select((1, "x"))
        new_tr, w, _ = chain.regenerate(jax.random.PRNGKey(4), tr, (3, 0.0),
                                        (gt.NoChange, gt.NoChange), sel)
        x1_new = float(new_tr[(1, "x")])
        assert x1_new != pytest.approx(2.0)
        np.testing.assert_allclose(float(new_tr[(0, "x")]), 1.0, rtol=1e-12)
        np.testing.assert_allclose(float(new_tr[(2, "x")]), 3.0, rtol=1e-12)
        # weight = new score of retained x_2 given new x_1, minus old
        np.testing.assert_allclose(
            float(w), N(3.0, x1_new, 1.0) - N(3.0, 2.0, 1.0), rtol=1e-9)

    def test_extension_fast_path(self):
        obs = jnp.array([1.0, 2.0])
        tr, _ = chain.generate(KEY, (2, 0.0), vector_choicemap(2, x=obs))
        cons = choicemap()
        cons.set_value((2, "x"), 3.0)
        new_tr, w, _, _ = chain.update(
            KEY, tr, (3, 0.0), (gt.IntDiff(1), gt.NoChange), cons)
        assert new_tr.length == 3
        np.testing.assert_allclose(w, N(3.0, 2.0, 1.0), rtol=1e-12)
        # prefix untouched
        np.testing.assert_allclose(new_tr.get_retval()[:2], obs)

    def test_update_midchain(self):
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, _ = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        cons = choicemap()
        cons.set_value((1, "x"), 0.5)
        new_tr, w, _, discard = chain.update(
            KEY, tr, (3, 0.0), (gt.NoChange, gt.NoChange), cons)
        # x1 changes: its own score diff + downstream x2 rescored
        expected = (N(0.5, 1, 1) - N(2, 1, 1)) + (N(3, 0.5, 1) - N(3, 2, 1))
        np.testing.assert_allclose(w, expected, rtol=1e-12)
        np.testing.assert_allclose(discard[(1, "x")], 2.0)

    def test_regenerate_timestep(self):
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, _ = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        new_tr, w, _ = chain.regenerate(
            jax.random.PRNGKey(5), tr, (3, 0.0),
            (gt.NoChange, gt.NoChange), select(1))
        x1 = float(new_tr[(1, "x")])
        expected = N(3.0, x1, 1) - N(3.0, 2.0, 1)
        np.testing.assert_allclose(w, expected, rtol=1e-10)

    def test_inside_model_with_params(self):
        @gen
        def knl(t, prev, drift):
            return gt.normal(prev + drift, 1.0) @ "x"

        unf = Unfold(knl)

        @gen
        def parent():
            drift = gt.normal(0.0, 1.0) @ "drift"
            xs = unf(5, 0.0, drift) @ "chain"
            return xs

        tr = parent.simulate(KEY, ())
        xs = np.asarray(tr.get_retval())
        d = float(tr["drift"])
        expected = (N(d, 0, 1) + N(xs[0], d, 1)
                    + sum(N(xs[t], xs[t - 1] + d, 1) for t in range(1, 5)))
        np.testing.assert_allclose(tr.get_score(), expected, rtol=1e-12)


class TestAt:
    def test_choice_at(self):
        ca = choice_at(gt.normal)
        tr = ca.simulate(KEY, (0.0, 1.0, "slot"))
        np.testing.assert_allclose(tr.get_choices()["slot"],
                                   tr.get_retval())
        tr2, w = ca.generate(KEY, (0.0, 1.0, "slot"),
                             choicemap(slot=1.3))
        np.testing.assert_allclose(w, N(1.3, 0, 1), rtol=1e-12)
        new_tr, uw, _, disc = ca.update(
            KEY, tr2, (0.0, 2.0, "slot"), (), choicemap())
        np.testing.assert_allclose(uw, N(1.3, 0, 2) - N(1.3, 0, 1), rtol=1e-12)

    def test_call_at(self):
        sub = call_at(kernel_fn)
        tr = sub.simulate(KEY, (1.0, "k"))
        y = tr.get_retval()
        np.testing.assert_allclose(tr.get_choices()[("k", "y")], y)
        w, rv = sub.assess((1.0, "k"), tr.get_choices())
        np.testing.assert_allclose(w, tr.get_score(), rtol=1e-12)


class TestMixture:
    def test_homogeneous(self):
        mix = gt.HomogeneousMixture(gt.normal, [0, 0])
        weights = jnp.array([0.4, 0.6])
        mus = jnp.array([-1.0, 2.0])
        stds = jnp.array([0.5, 1.0])
        lp = mix.logpdf(0.3, weights, mus, stds)
        expected = np.logaddexp(np.log(0.4) + N(0.3, -1, 0.5),
                                np.log(0.6) + N(0.3, 2, 1.0))
        np.testing.assert_allclose(lp, expected, rtol=1e-10)
        # gradient check vs finite diff on a weight
        g = mix.logpdf_grad(0.3, weights, mus, stds)
        eps = 1e-6
        fd = (float(mix.logpdf(0.3, weights + jnp.array([eps, 0]), mus, stds))
              - float(mix.logpdf(0.3, weights - jnp.array([eps, 0]), mus, stds))) / (2 * eps)
        np.testing.assert_allclose(g[1][0], fd, rtol=1e-4)
        # sampling statistics
        ks = jax.random.split(KEY, 8000)
        xs = jax.vmap(lambda k: mix.sample(k, weights, mus, stds))(ks)
        np.testing.assert_allclose(jnp.mean(xs), 0.4 * -1 + 0.6 * 2, atol=0.05)

    def test_heterogeneous(self):
        mix = gt.HeterogeneousMixture([gt.normal, gt.uniform])
        weights = jnp.array([0.3, 0.7])
        lp = mix.logpdf(0.5, weights, 0.0, 1.0, 0.0, 2.0)
        expected = np.logaddexp(np.log(0.3) + N(0.5, 0, 1),
                                np.log(0.7) - np.log(2.0))
        np.testing.assert_allclose(lp, expected, rtol=1e-10)
        s = mix.sample(KEY, weights, 0.0, 1.0, 0.0, 2.0)
        assert np.isfinite(float(s))

    def test_mixture_in_model(self):
        mix = gt.HomogeneousMixture(gt.normal, [0, 0])

        @gen
        def m():
            return mix(jnp.array([0.5, 0.5]), jnp.array([0.0, 5.0]),
                       jnp.array([1.0, 1.0])) @ "x"

        tr = m.simulate(KEY, ())
        x = float(tr["x"])
        expected = np.logaddexp(np.log(0.5) + N(x, 0, 1),
                                np.log(0.5) + N(x, 5, 1))
        np.testing.assert_allclose(tr.get_score(), expected, rtol=1e-12)


class TestEdgePaths:
    def test_unfold_shrink(self):
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, _ = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        new_tr, w, _, disc = chain.update(
            KEY, tr, (2, 0.0), (gt.UnknownChange, gt.NoChange), choicemap())
        np.testing.assert_allclose(float(w), -N(3.0, 2.0, 1.0), rtol=1e-12)
        assert disc.has_value((2, "x"))
        assert new_tr.length == 2

    def test_unfold_regenerate_all(self):
        obs = jnp.array([1.0, 2.0, 3.0])
        tr, _ = chain.generate(KEY, (3, 0.0), vector_choicemap(3, x=obs))
        new_tr, w, _ = chain.regenerate(
            jax.random.PRNGKey(1), tr, (3, 0.0),
            (gt.NoChange, gt.NoChange), gt.ALL)
        np.testing.assert_allclose(float(w), 0.0, atol=1e-10)
        assert not np.allclose(np.asarray(new_tr.get_retval()),
                               np.asarray(tr.get_retval()))

    def test_switch_traced_index_regenerate(self):
        from gen_tpu import Switch

        @gen
        def c0():
            return gt.normal(0.0, 1.0) @ "v"

        @gen
        def c1():
            return gt.normal(5.0, 1.0) @ "v"

        sw = Switch(c0, c1)

        def run(key, idx):
            tr = sw.simulate(key, (idx,))
            new_tr, w, _ = sw.regenerate(key, tr, (idx,), (gt.NoChange,),
                                         gt.select("v"))
            return new_tr.get_score(), w

        scores, ws = jax.jit(jax.vmap(run))(
            jax.random.split(KEY, 8), jnp.array([0, 1] * 4))
        assert np.isfinite(np.asarray(scores)).all()
        np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-12)

    def test_map_project_single_element(self):
        tr = mapped.simulate(KEY, (jnp.array([0.0, 1.0]),))
        p = tr.project(select((0, "y")))
        y0 = float(tr.get_choices()[(0, "y")])
        np.testing.assert_allclose(float(p), N(y0, 0.0, 1.0), rtol=1e-10)
