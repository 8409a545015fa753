"""Switch combinator, derived distributions (@dist analogue), and
CustomDetermGF (reference: test/modeling_library/switch.jl 340 LoC,
dist_dsl.jl, custom_determ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gen_tpu as gt
from gen_tpu import Switch, choicemap, gen, select
from gen_tpu.dists import (RelabeledDistribution, exp_of, affine_bijection,
                           TransformedDistribution)
from gen_tpu.combinators import CustomGradientGF, CustomUpdateGF

KEY = jax.random.PRNGKey(0)


@gen
def branch_a(mu):
    x = gt.normal(mu, 1.0) @ "x"
    return x


@gen
def branch_b(mu):
    x = gt.normal(mu, 2.0) @ "x"
    y = gt.normal(x, 0.5) @ "y"
    return y


sw = Switch(branch_a, branch_b)


def N(v, mu, std):
    return stats.norm.logpdf(float(v), mu, std)


class TestSwitch:
    def test_simulate_concrete(self):
        tr = sw.simulate(KEY, (0, 1.0))
        np.testing.assert_allclose(tr.get_score(), N(tr["x"], 1.0, 1.0),
                                   rtol=1e-12)
        tr1 = sw.simulate(KEY, (1, 1.0))
        expected = N(tr1["x"], 1.0, 2.0) + N(tr1["y"], float(tr1["x"]), 0.5)
        np.testing.assert_allclose(tr1.get_score(), expected, rtol=1e-12)

    def test_generate_and_update_same_index(self):
        tr, w = sw.generate(KEY, (0, 1.0), choicemap(x=0.5))
        np.testing.assert_allclose(w, N(0.5, 1.0, 1.0), rtol=1e-12)
        new_tr, uw, _, disc = sw.update(
            KEY, tr, (0, 2.0), (gt.NoChange, gt.UnknownChange), choicemap())
        np.testing.assert_allclose(uw, N(0.5, 2.0, 1.0) - N(0.5, 1.0, 1.0),
                                   rtol=1e-12)

    def test_update_index_change_inherits_shared(self):
        tr, _ = sw.generate(KEY, (0, 1.0), choicemap(x=0.5))
        new_tr, w, _, disc = sw.update(
            jax.random.PRNGKey(1), tr, (1, 1.0),
            (gt.UnknownChange, gt.NoChange), choicemap())
        # x inherited into branch b; y freshly sampled
        np.testing.assert_allclose(new_tr["x"], 0.5)
        y = float(new_tr["y"])
        # weight = generate_weight - prev_score (reference
        # switch/update.jl:95-98); generate weight counts inherited x only
        expected = N(0.5, 1.0, 2.0) - N(0.5, 1.0, 1.0)
        np.testing.assert_allclose(w, expected, rtol=1e-12)
        # y existed in neither -> not discarded; x retained -> not discarded
        assert disc.is_empty()

    def test_update_index_change_discards_dropped(self):
        tr, _ = sw.generate(KEY, (1, 1.0), choicemap(x=0.5, y=0.2))
        new_tr, w, _, disc = sw.update(
            jax.random.PRNGKey(1), tr, (0, 1.0),
            (gt.UnknownChange, gt.NoChange), choicemap())
        np.testing.assert_allclose(new_tr["x"], 0.5)
        np.testing.assert_allclose(disc["y"], 0.2)  # y dropped by branch a
        expected = N(0.5, 1.0, 1.0) - (N(0.5, 1.0, 2.0) + N(0.2, 0.5, 0.5))
        np.testing.assert_allclose(w, expected, rtol=1e-12)

    def test_traced_index_all_branches(self):
        @gen
        def c0():
            return gt.normal(0.0, 1.0) @ "v"

        @gen
        def c1():
            return gt.normal(5.0, 1.0) @ "v"

        sw2 = Switch(c0, c1)

        def run(key, idx):
            tr = sw2.simulate(key, (idx,))
            return tr.get_score(), tr.get_retval()

        keys = jax.random.split(KEY, 100)
        idxs = jnp.array([0, 1] * 50)
        scores, vals = jax.jit(jax.vmap(run))(keys, idxs)
        vals = np.asarray(vals)
        assert abs(vals[idxs == 0].mean()) < 0.5
        assert abs(vals[np.asarray(idxs) == 1].mean() - 5.0) < 0.5

    def test_traced_index_update_change_exact_weight(self):
        """Traced-index index-change update must match the concrete-index
        semantics: inherit shared addresses, weight = gen_w - prev_score,
        masked discard of dropped addresses."""
        def run(key, prev_idx, new_idx):
            k1, k2 = jax.random.split(key)
            tr, _ = sw.generate(k1, (prev_idx, 1.0),
                                choicemap(x=0.5, y=0.2))
            new_tr, w, _, disc = sw.update(
                k2, tr, (new_idx, 1.0), (gt.UnknownChange, gt.NoChange),
                choicemap())
            return new_tr, w, disc

        new_tr, w, disc = jax.jit(run)(KEY, jnp.asarray(1), jnp.asarray(0))
        # x inherited from branch b into branch a
        np.testing.assert_allclose(new_tr["x"], 0.5)
        expected = N(0.5, 1.0, 1.0) - (N(0.5, 1.0, 2.0) + N(0.2, 0.5, 0.5))
        np.testing.assert_allclose(w, expected, rtol=1e-12)
        # y dropped by branch a -> masked-discarded; x inherited -> flag off
        dy = disc.get_value("y")
        assert bool(dy.flag) and float(dy.value) == pytest.approx(0.2)
        dx = disc.get_value("x")
        assert not bool(dx.flag)

        # same index under jit: no constraints, no arg change -> weight 0
        _, w_same, disc_same = jax.jit(run)(KEY, jnp.asarray(1),
                                            jnp.asarray(1))
        np.testing.assert_allclose(w_same, 0.0, atol=1e-12)
        for _, v in disc_same.leaf_items():
            assert not bool(v.flag)

    def test_traced_index_regenerate_change_exact_weight(self):
        """Traced-index index-change regenerate: retained (unselected)
        choices constrain the new branch; weight matches the concrete-index
        formula."""
        def run(key, prev_idx, new_idx):
            k1, k2 = jax.random.split(key)
            tr, _ = sw.generate(k1, (prev_idx, 1.0), choicemap(x=0.5))
            new_tr, w, _ = sw.regenerate(
                k2, tr, (new_idx, 1.0), (gt.UnknownChange, gt.NoChange),
                select("x"))
            return new_tr, w

        new_tr, w = jax.jit(run)(KEY, jnp.asarray(0), jnp.asarray(1))
        x_new = float(new_tr["x"])
        # x selected (resampled from the new branch's prior -> cancels), y
        # fresh in the new branch (cancels), nothing retained -> weight 0
        # (GFI contract weight; NOT the reference's ±project(sel) formula,
        # which the mixture-posterior test below shows is biased)
        np.testing.assert_allclose(w, 0.0, atol=1e-12)
        assert x_new != pytest.approx(0.5)  # x was resampled

        # retained-choice case: select nothing, change the index; x carries
        # over and is re-scored, y is fresh -> weight = lp_b(x) - lp_a(x)
        def run2(key, prev_idx, new_idx):
            k1, k2 = jax.random.split(key)
            tr, _ = sw.generate(k1, (prev_idx, 1.0), choicemap(x=0.5))
            new_tr, w, _ = sw.regenerate(
                k2, tr, (new_idx, 1.0), (gt.UnknownChange, gt.NoChange),
                select("nothing"))
            return new_tr, w

        new_tr2, w2 = jax.jit(run2)(KEY, jnp.asarray(0), jnp.asarray(1))
        np.testing.assert_allclose(new_tr2["x"], 0.5)
        np.testing.assert_allclose(
            w2, N(0.5, 1.0, 2.0) - N(0.5, 1.0, 1.0), rtol=1e-12)

    def test_traced_switch_mixture_mh_unbiased(self):
        """End-to-end stationarity: selection-MH over a 2-component mixture
        whose component is a traced-index Switch must recover the exact
        posterior P(z=1|obs). This is the test that catches the reference's
        biased index-change regenerate weight (switch/regenerate.jl:20-24)."""
        @gen
        def c0():
            return gt.normal(-2.0, 1.0) @ "v"

        @gen
        def c1():
            return gt.normal(2.0, 1.0) @ "v"

        sw2 = Switch(c0, c1)

        @gen
        def mixture():
            z = gt.bernoulli(0.5) @ "z"
            v = sw2(jnp.int32(z)) @ "b"
            gt.normal(v, 0.5) @ "obs"

        obs = choicemap(obs=1.2)
        sel = select("z", ("b", "v"))

        def one_chain(key):
            k0, k1 = jax.random.split(key)
            tr, _ = mixture.generate(k0, (), obs)

            def body(t, k):
                ka, kb = jax.random.split(k)
                new_t, w, _ = mixture.regenerate(ka, t, (), (), sel)
                acc = jnp.log(jax.random.uniform(kb)) < w
                t2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc, a, b), new_t, t)
                return t2, t2["z"]

            _, zs = jax.lax.scan(body, tr, jax.random.split(k1, 4000))
            return jnp.mean(zs[500:])

        means = jax.jit(jax.vmap(one_chain))(
            jax.random.split(jax.random.PRNGKey(42), 8))
        p1 = float(jnp.mean(means))
        l1 = stats.norm.pdf(1.2, 2, np.sqrt(1.25))
        l0 = stats.norm.pdf(1.2, -2, np.sqrt(1.25))
        exact = l1 / (l0 + l1)
        assert abs(p1 - exact) < 0.01, (p1, exact)

    def test_traced_index_keyfree_update(self):
        """key=None Gibbs-style updates must work on all-branches traces
        (no sampling: the changed-index inheritance leg is skipped)."""
        def run(key, idx, x_new):
            tr, _ = sw.generate(key, (idx, 1.0), choicemap(x=0.5, y=0.2))
            new_tr, w, _, disc = sw.update(
                None, tr, (idx, 1.0), (gt.NoChange, gt.NoChange),
                choicemap(x=x_new))
            return w, disc

        w, disc = jax.jit(run)(KEY, jnp.asarray(1), 0.9)
        expected = (N(0.9, 1.0, 2.0) + N(0.2, 0.9, 0.5)
                    - N(0.5, 1.0, 2.0) - N(0.2, 0.5, 0.5))
        np.testing.assert_allclose(w, expected, rtol=1e-12)
        dx = disc.get_value("x")
        assert bool(dx.flag) and float(dx.value) == pytest.approx(0.5)

    def test_traced_index_mixed_shape_update_warns_not_raises(self):
        """Branches disagreeing on an address's shape degrade the discard
        (with a warning) instead of failing the whole update."""
        @gen
        def s0():
            return gt.normal(0.0, 1.0) @ "x"

        @gen
        def s1():
            return jnp.sum(gt.normal(jnp.zeros(2), 1.0) @ "x")

        swm = Switch(s0, s1)

        def run(key, idx):
            tr = swm.simulate(key, (idx,))
            new_tr, w, _, _ = swm.update(
                jax.random.fold_in(key, 1), tr, (idx,), (gt.NoChange,),
                choicemap())
            return w

        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            w = jax.jit(run)(KEY, jnp.asarray(0))
        np.testing.assert_allclose(w, 0.0, atol=1e-12)

    def test_traced_index_masked_selection_regenerate(self):
        """Branchless random-scan moves over a traced-index Switch."""
        from gen_tpu.masked import masked_select

        def run(key, idx, flag):
            k1, k2 = jax.random.split(key)
            tr, _ = sw.generate(k1, (idx, 1.0), choicemap(x=0.5))
            new_tr, w, _ = sw.regenerate(
                k2, tr, (idx, 1.0), (gt.NoChange, gt.NoChange),
                masked_select(x=flag))
            return new_tr["x"] if False else (w, new_tr.branch_traces)

        w, _ = jax.jit(lambda k, i, f: run(k, i, f)[0:2])(
            KEY, jnp.asarray(0), jnp.asarray(True))
        assert np.isfinite(float(w))
        # flag off -> nothing resampled -> weight 0
        w0, _ = jax.jit(lambda k, i, f: run(k, i, f)[0:2])(
            KEY, jnp.asarray(0), jnp.asarray(False))
        np.testing.assert_allclose(w0, 0.0, atol=1e-12)

    def test_switch_inside_model(self):
        @gen
        def model():
            which = gt.bernoulli(0.5) @ "which"
            v = sw(jnp.int32(which), 0.0) @ "b"
            return v

        tr = model.simulate(KEY, ())
        assert np.isfinite(float(tr.get_score()))


class TestDistDSL:
    def test_affine_transform(self):
        d = gt.normal * 2.0 + 3.0  # N(3 + 2*mu_arg...) careful: transforms output
        # y = 2x + 3, x ~ N(0,1) -> y ~ N(3, 2)
        lp = d.logpdf(4.0, 0.0, 1.0)
        np.testing.assert_allclose(lp, stats.norm.logpdf(4.0, 3.0, 2.0),
                                   rtol=1e-10)
        ks = jax.random.split(KEY, 4000)
        ys = jax.vmap(lambda k: d.sample(k, 0.0, 1.0))(ks)
        np.testing.assert_allclose(jnp.mean(ys), 3.0, atol=0.1)
        np.testing.assert_allclose(jnp.std(ys), 2.0, atol=0.1)

    def test_exp_transform_lognormal(self):
        d = exp_of(gt.normal)
        lp = d.logpdf(2.0, 0.5, 1.0)
        np.testing.assert_allclose(lp, stats.lognorm.logpdf(2.0, 1.0,
                                                            scale=np.exp(0.5)),
                                   rtol=1e-10)

    def test_relabeled(self):
        labels = jnp.array([10, 20, 10])
        d = RelabeledDistribution(labels, gt.categorical)
        probs = jnp.array([0.2, 0.3, 0.5])
        # P(10) = 0.2 + 0.5 (duplicate labels sum)
        np.testing.assert_allclose(d.logpdf(10, probs), np.log(0.7), rtol=1e-10)
        np.testing.assert_allclose(d.logpdf(20, probs), np.log(0.3), rtol=1e-10)
        s = d.sample(KEY, probs)
        assert int(s) in (10, 20)

    def test_in_model_with_grad(self):
        d = gt.normal * 0.5  # y ~ N(mu/2... no: y = x/2, x~N(mu, std)

        @gen
        def m():
            return d(1.0, 1.0) @ "y"

        tr, w = m.generate(KEY, (), choicemap(y=0.8))
        np.testing.assert_allclose(w, stats.norm.logpdf(0.8, 0.5, 0.5),
                                   rtol=1e-10)
        _, _, grads = m.choice_gradients(tr, select("y"))
        eps = 1e-6
        fd = (stats.norm.logpdf(0.8 + eps, 0.5, 0.5)
              - stats.norm.logpdf(0.8 - eps, 0.5, 0.5)) / (2 * eps)
        np.testing.assert_allclose(grads["y"], fd, rtol=1e-4)


class TestCustomDeterm:
    def test_custom_gradient_gf(self):
        f = CustomGradientGF(lambda x: jnp.sum(x ** 2))

        @gen
        def m():
            z = gt.normal(jnp.zeros(3), 1.0) @ "z"
            s = f(z) @ "sumsq"
            gt.normal(s, 1.0) @ "y"

        tr, w = m.generate(KEY, (), choicemap(
            z=jnp.array([1.0, 2.0, 0.0]), y=4.0))
        np.testing.assert_allclose(tr["sumsq"], 5.0)
        np.testing.assert_allclose(
            w, stats.norm.logpdf(4.0, 5.0, 1.0)
            + stats.norm.logpdf([1.0, 2.0, 0.0]).sum(), rtol=1e-10)
        # gradient flows through the deterministic node
        _, _, grads = m.choice_gradients(tr, select("z"))
        # d/dz [ logN(z;0,1) + logN(4; sum z^2, 1) ] = -z + (4-5)*2z
        expected = -np.array([1.0, 2.0, 0.0]) + (4 - 5) * 2 * np.array([1.0, 2.0, 0.0])
        np.testing.assert_allclose(np.asarray(grads["z"]), expected, rtol=1e-6)

    def test_custom_update_gf(self):
        calls = {"apply": 0, "update": 0}

        def apply_fn(xs):
            calls["apply"] += 1
            return jnp.sum(xs)

        def update_fn(state, args, argdiffs):
            calls["update"] += 1
            return state, state, gt.NoChange  # pretend nothing changed

        cu = CustomUpdateGF(apply_fn, update_fn)

        @gen
        def m(xs):
            s = cu(xs) @ "s"
            gt.normal(s, 1.0) @ "y"

        xs = jnp.arange(3.0)
        tr, _ = m.generate(KEY, (xs,), choicemap(y=1.0))
        assert calls["apply"] == 1
        new_tr, w, _, _ = m.update(KEY, tr, (xs,), (gt.NoChange,),
                                   choicemap(y=2.0))
        assert calls["update"] == 1
        np.testing.assert_allclose(
            w, stats.norm.logpdf(2.0, 3.0, 1.0)
            - stats.norm.logpdf(1.0, 3.0, 1.0), rtol=1e-10)


def test_enum_dist():
    """@dist Enum-construction parity (reference dist_dsl.jl:229-235): an
    index distribution relabeled through an IntEnum's values, with
    duplicate-value mass summing."""
    import enum
    from gen_tpu.dists import enum_dist

    class Color(enum.IntEnum):
        RED = 10
        GREEN = 20
        BLUE = 30

    probs = jnp.asarray([0.2, 0.3, 0.5])
    d = enum_dist(Color, gt.categorical)
    v = d.sample(jax.random.PRNGKey(0), probs)
    assert int(v) in (10, 20, 30)
    assert Color(int(v)) in Color
    np.testing.assert_allclose(float(d.logpdf(20, probs)), np.log(0.3),
                               rtol=1e-6)
    # duplicate enum values sum their index mass
    class Dup(enum.IntEnum):
        A = 1
        B = 2
        C = 1  # alias of A in value

    # IntEnum collapses aliases in iteration; use an explicit relabel to
    # pin the duplicate-mass semantics the Enum sugar inherits
    from gen_tpu.dists import RelabeledDistribution
    d2 = RelabeledDistribution(jnp.asarray([1, 2, 1]), gt.categorical)
    np.testing.assert_allclose(float(d2.logpdf(1, probs)), np.log(0.7),
                               rtol=1e-6)
    # the full GFI path: trace the enum-valued choice in a model
    @gen
    def m():
        c = enum_dist(Color, gt.categorical)(probs) @ "color"
        return c

    tr = m.simulate(jax.random.PRNGKey(1), ())
    w, _ = m.assess((), tr.get_choices())
    assert np.isfinite(float(w))
