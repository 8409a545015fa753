"""Recurse combinator (reference: test/modeling_library/recurse.jl) and the
static IR (reference: test/static_ir/static_ir.jl, render_ir)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gen_tpu as gt
from gen_tpu import Recurse, choicemap, gen, select
from gen_tpu.static_ir import StaticIRBuilder, StaticGenFn, render_ir

KEY = jax.random.PRNGKey(0)

# stochastic binary tree: each node holds a gaussian value; branches with
# prob p at depth < D; aggregation sums the node value with active children.
B, D = 2, 3


@gen
def production(u):
    v = gt.normal(u, 1.0) @ "v"
    branch = gt.bernoulli(0.4) @ "branch"
    nchild = jnp.where(branch, 2, 0)
    child_inputs = jnp.stack([v * 0.5, v * -0.5])
    return (v, nchild, child_inputs)


@gen
def aggregation(v, child_ws, nchild):
    mask = jnp.arange(B) < nchild
    total = v + jnp.sum(jnp.where(mask, child_ws, 0.0))
    return total


tree_fn = Recurse(production, aggregation, B, D, w_example=jnp.asarray(0.0))


class TestRecurse:
    def test_simulate_score_is_active_joint(self):
        tr = tree_fn.simulate(KEY, (0.0,))
        active = np.asarray(tr.active)
        assert active[0]
        # hand-compute the active joint
        expected = 0.0
        for i in range(tree_fn.n_nodes):
            if not active[i]:
                continue
            sub = tr.prod_subs[i]
            expected += float(sub.get_score()) + float(
                tr.agg_subs[i].get_score())
        np.testing.assert_allclose(float(tr.get_score()), expected,
                                   rtol=1e-10)
        # choices only expose active nodes
        ch = tr.get_choices()
        for i in range(tree_fn.n_nodes):
            assert ch.has_value((i, "production", "v")) == bool(active[i])

    def test_retval_aggregates(self):
        tr = tree_fn.simulate(jax.random.PRNGKey(3), (0.0,))
        active = np.asarray(tr.active)
        # recompute expected aggregate bottom-up over active nodes
        vs = [float(tr[(i, "production", "v")]) if active[i] else 0.0
              for i in range(tree_fn.n_nodes)]
        ws = [0.0] * tree_fn.n_nodes
        for i in reversed(range(tree_fn.n_nodes)):
            if not active[i]:
                continue
            total = vs[i]
            for j in range(B):
                ci = i * B + j + 1
                if ci < tree_fn.n_nodes and active[ci]:
                    total += ws[ci]
            ws[i] = total
        np.testing.assert_allclose(float(tr.get_retval()), ws[0], rtol=1e-8)

    def test_generate_weight(self):
        cons = gt.ChoiceMap()
        cons.set_value((0, "production", "v"), 1.5)
        cons.set_value((0, "production", "branch"), False)
        tr, w = tree_fn.generate(KEY, (0.0,), cons)
        expected = stats.norm.logpdf(1.5, 0.0, 1.0) + np.log(0.6)
        np.testing.assert_allclose(float(w), expected, rtol=1e-10)
        assert not np.asarray(tr.active)[1]

    def test_update_grow_tree(self):
        cons = gt.ChoiceMap()
        cons.set_value((0, "production", "v"), 1.0)
        cons.set_value((0, "production", "branch"), False)
        tr, _ = tree_fn.generate(KEY, (0.0,), cons)
        # flip the root's branch decision: children activate
        flip = gt.ChoiceMap()
        flip.set_value((0, "production", "branch"), True)
        new_tr, w, _, discard = tree_fn.update(
            jax.random.PRNGKey(1), tr, (0.0,), (gt.UnknownChange,), flip)
        na = np.asarray(new_tr.active)
        assert na[1] and na[2]
        np.testing.assert_allclose(discard[(0, "production", "branch")],
                                   False)
        # weight: branch flip logpdf diff; fresh children contribute 0
        np.testing.assert_allclose(float(w), np.log(0.4) - np.log(0.6),
                                   rtol=1e-8)

    def test_update_shrink_tree(self):
        cons = gt.ChoiceMap()
        cons.set_value((0, "production", "branch"), True)
        cons.set_value((1, "production", "branch"), False)
        cons.set_value((2, "production", "branch"), False)
        tr, _ = tree_fn.generate(KEY, (0.0,), cons)
        assert np.asarray(tr.active)[1]
        prev_child_scores = sum(
            float(tr.prod_subs[i].get_score()) + float(
                tr.agg_subs[i].get_score())
            for i in (1, 2))
        flip = gt.ChoiceMap()
        flip.set_value((0, "production", "branch"), False)
        new_tr, w, _, discard = tree_fn.update(
            jax.random.PRNGKey(1), tr, (0.0,), (gt.UnknownChange,), flip)
        assert not np.asarray(new_tr.active)[1]
        expected = (np.log(0.6) - np.log(0.4)) - prev_child_scores
        np.testing.assert_allclose(float(w), expected, rtol=1e-8)
        assert discard.has_value((1, "production", "v"))

    def test_assess_and_gradients(self):
        """assess is key-free/differentiable (active structure static from
        the choices); gradients flow through the tree."""
        tr = tree_fn.simulate(jax.random.PRNGKey(3), (0.0,))
        w, rv = tree_fn.assess((0.0,), tr.get_choices())
        np.testing.assert_allclose(float(w), float(tr.get_score()),
                                   rtol=1e-12)
        sel = select((0, "production", "v"))
        _, values, grads = tree_fn.choice_gradients(tr, sel)
        g = float(np.asarray(grads[(0, "production", "v")]))
        eps = 1e-6

        def score_with_root(v):
            c2 = gt.ChoiceMap()
            for p, val in tr.get_choices().leaf_items():
                c2.set_value(p, val if p != (0, "production", "v") else v)
            return float(tree_fn.assess((0.0,), c2)[0])

        v0 = float(values[(0, "production", "v")])
        fd = (score_with_root(v0 + eps) - score_with_root(v0 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)

    def test_mcmc_over_tree_structure(self):
        """Structure-changing MH on the arena mixes over tree sizes."""
        tr = tree_fn.simulate(KEY, (0.0,))
        sizes = []
        key = KEY
        for i in range(100):
            key, sub = jax.random.split(key)
            from gen_tpu.inference import mh_selection
            tr, _ = mh_selection(sub, tr, select((0, "production", "branch")))
            sizes.append(int(np.asarray(tr.active).sum()))
        assert len(set(sizes)) > 1  # structure actually moves


class TestStaticIR:
    def _build(self):
        b = StaticIRBuilder("static_reg")
        xs = b.argument("xs")
        slope = b.choice(gt.normal, [b.julia(lambda: 0.0, []),
                                     b.julia(lambda: 2.0, [])], addr="slope")
        mu = b.julia(lambda s, x: s * x, [slope, xs], name="mu")
        ys = b.choice(gt.normal, [mu, b.julia(lambda: 0.5, [])], addr="ys")
        b.set_return(ys)
        return StaticGenFn(b.build())

    def test_full_gfi(self):
        fn = self._build()
        xs = jnp.array([1.0, 2.0])
        tr = fn.simulate(KEY, (xs,))
        s = np.asarray(tr["slope"])
        ys = np.asarray(tr["ys"])
        expected = (stats.norm.logpdf(s, 0, 2)
                    + stats.norm.logpdf(ys, s * np.asarray(xs), 0.5).sum())
        np.testing.assert_allclose(float(tr.get_score()), expected,
                                   rtol=1e-10)
        # generate / update / gradients all flow through the same machinery
        tr2, w = fn.generate(KEY, (xs,), choicemap(slope=0.3))
        np.testing.assert_allclose(float(w),
                                   stats.norm.logpdf(0.3, 0, 2), rtol=1e-10)
        _, _, grads = fn.choice_gradients(tr2, select("slope"))
        assert np.isfinite(float(np.asarray(grads["slope"])))

    def test_validation(self):
        b = StaticIRBuilder()
        x = b.argument("x")
        b.choice(gt.normal, [x, x], addr="a")
        with pytest.raises(ValueError):
            b.choice(gt.normal, [x, x], addr="a")  # duplicate address
        other = StaticIRBuilder()
        foreign = other.argument("y")
        with pytest.raises(ValueError):
            b.julia(lambda v: v, [foreign])  # foreign node

    def test_render(self):
        fn = self._build()
        dot = render_ir(fn.ir)
        assert "digraph" in dot and "slope" in dot and "->" in dot
