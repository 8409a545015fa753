"""GFI property tests: measure-theoretic invariants that must hold for ANY
model (the analogue of the reference's exhaustive per-case weight tests,
compressed into laws).

Law 1 (update round trip): for t' = update(t, u) with discard v,
update(t', v) recovers t exactly and the weights negate (the documented
involution property of update, reference gen_fn_interface.jl:246-277).

Law 2 (generate/assess consistency): generate weight with FULL constraints
equals the assess weight equals the trace score (no unaddressed
randomness).

Law 3 (project partition): project(t, S) + project(t, complement(S)) =
score for any selection S.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import Map, Unfold, choicemap, gen, select, vector_choicemap

KEY = jax.random.PRNGKey(0)


@gen
def sub(mu):
    return gt.normal(mu, 0.7) @ "a"


@gen
def fixed_model(x):
    m = gt.normal(0.0, 2.0) @ "m"
    s = sub(m) @ "call"
    gt.gamma(2.0, 1.0) @ "g"
    gt.normal(s * x, 0.5) @ "y"
    return s


@gen
def branch_model():
    b = gt.bernoulli(0.4) @ "b"
    if b:
        gt.normal(0.0, 1.0) @ "x"
        gt.normal(1.0, 1.0) @ "x2"
    else:
        gt.gamma(2.0, 2.0) @ "z"


def _roundtrip(model, args, trace, constraints, key):
    t1, w1, _, discard = model.update(key, trace, args,
                                      gt.all_unknown_change(args),
                                      constraints)
    t2, w2, _, discard2 = model.update(jax.random.PRNGKey(99), t1, args,
                                       gt.all_unknown_change(args), discard)
    return t1, t2, w1, w2, discard, discard2


class TestUpdateRoundTrip:
    def test_fixed_structure(self):
        for seed in range(5):
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
            trace = fixed_model.simulate(k1, (1.3,))
            cons = choicemap(m=float(jax.random.normal(k2)))
            cons.set_value(("call", "a"), 0.4)
            t1, t2, w1, w2, d1, d2 = _roundtrip(fixed_model, (1.3,), trace,
                                                cons, k3)
            # values restored exactly
            assert t2.get_choices().allclose(trace.get_choices(), atol=1e-12)
            # weights negate
            np.testing.assert_allclose(float(w1 + w2), 0.0, atol=1e-10)
            # second discard equals the original constraints
            assert d2.allclose(cons, atol=1e-12)

    def test_structure_change(self):
        trace, _ = branch_model.generate(KEY, (),
                                         choicemap(b=True, x=0.5, x2=1.5))
        cons = choicemap(b=False, z=2.0)
        t1, t2, w1, w2, d1, d2 = _roundtrip(branch_model, (), trace, cons,
                                            jax.random.PRNGKey(7))
        assert t2.get_choices().allclose(trace.get_choices(), atol=1e-12)
        np.testing.assert_allclose(float(w1 + w2), 0.0, atol=1e-10)
        # discard of the branch flip carries the deleted branch's choices
        assert d1.has_value("x") and d1.has_value("x2") and d1.has_value("b")

    def test_map_combinator(self):
        mapped = Map(sub)
        mus = jnp.array([0.0, 1.0, 2.0])
        trace = mapped.simulate(KEY, (mus,))
        cons = vector_choicemap(3, a=jnp.array([0.1, 0.2, 0.3]))
        t1, w1, _, d1 = mapped.update(KEY, trace, (mus,),
                                      (gt.UnknownChange,), cons)
        t2, w2, _, d2 = mapped.update(KEY, t1, (mus,), (gt.UnknownChange,),
                                      d1)
        np.testing.assert_allclose(float(w1 + w2), 0.0, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(t2.subtraces.get_choices()["a"]),
            np.asarray(trace.subtraces.get_choices()["a"]), atol=1e-12)


class TestGenerateAssessConsistency:
    def test_full_constraints(self):
        for seed in range(3):
            k = jax.random.PRNGKey(seed)
            trace = fixed_model.simulate(k, (0.7,))
            full = trace.get_choices()
            t2, w = fixed_model.generate(jax.random.PRNGKey(1), (0.7,), full)
            aw, _ = fixed_model.assess((0.7,), full)
            np.testing.assert_allclose(float(w), float(trace.get_score()),
                                       rtol=1e-12)
            np.testing.assert_allclose(float(aw), float(trace.get_score()),
                                       rtol=1e-12)


class TestProjectPartition:
    def test_partition(self):
        trace = fixed_model.simulate(KEY, (0.7,))
        for sel in (select("m"), select("g", ("call", "a")),
                    select("y"), gt.NONE, gt.ALL):
            total = (float(trace.project(sel))
                     + float(trace.project(sel.complement())))
            np.testing.assert_allclose(total, float(trace.get_score()),
                                       rtol=1e-12, err_msg=repr(sel))

    def test_unfold_partition(self):
        @gen
        def kern(t, prev):
            return gt.normal(prev, 0.7) @ "a"

        chain = Unfold(kern)
        trace = chain.simulate(KEY, (4, 0.0))
        sel = select(1, 3)
        total = (float(trace.project(sel))
                 + float(trace.project(sel.complement())))
        np.testing.assert_allclose(total, float(trace.get_score()),
                                   rtol=1e-12)


class TestNewCombinatorLaws:
    def test_traced_switch_update_roundtrip(self):
        """Law 1 for the traced-index masked-universe Switch: updating with
        the (masked) discard undoes an index change exactly."""
        @gen
        def ba(mu):
            return gt.normal(mu, 1.0) @ "x"

        @gen
        def bb(mu):
            x = gt.normal(mu, 2.0) @ "x"
            gt.normal(x, 0.5) @ "y"

        sw = gt.Switch(ba, bb)

        def run(key, prev_idx, new_idx):
            k1, k2, k3 = jax.random.split(key, 3)
            tr, _ = sw.generate(k1, (prev_idx, 1.0),
                                choicemap(x=0.5, y=0.2))
            t1, w1, _, d1 = sw.update(k2, tr, (new_idx, 1.0),
                                      (gt.UnknownChange, gt.NoChange),
                                      choicemap())
            t2, w2, _, d2 = sw.update(k3, t1, (prev_idx, 1.0),
                                      (gt.UnknownChange, gt.NoChange), d1)
            return (w1, w2, t2.get_score(), tr.get_score())

        w1, w2, s2, s0 = jax.jit(run)(KEY, jnp.asarray(1), jnp.asarray(0))
        np.testing.assert_allclose(float(w1 + w2), 0.0, atol=1e-10)
        np.testing.assert_allclose(float(s2), float(s0), atol=1e-10)

    def test_recurse_leveled_update_roundtrip(self):
        from gen_tpu import RecurseLeveled

        B = 2

        @gen
        def production(u):
            v = gt.normal(u, 1.0) @ "v"
            branch = gt.bernoulli(0.4) @ "branch"
            return (v, jnp.where(branch, 2, 0),
                    jnp.stack([v * 0.5, -v * 0.5]))

        @gen
        def aggregation(v, child_ws, nchild):
            mask = jnp.arange(B) < nchild
            return v + jnp.sum(jnp.where(mask, child_ws, 0.0))

        fn = RecurseLeveled(production, aggregation, B, 3,
                            w_example=jnp.asarray(0.0))
        cons = gt.ChoiceMap()
        cons.set_value((0, "production", "v"), 0.3)
        cons.set_value((0, "production", "branch"), True)
        trace, _ = fn.generate(KEY, (0.0,), cons)

        shrink = gt.ChoiceMap().set_value((0, "production", "branch"),
                                          False)
        t1, w1, _, d1 = fn.update(jax.random.PRNGKey(1), trace, (0.0,),
                                  (gt.NoChange,), shrink)
        t2, w2, _, d2 = fn.update(jax.random.PRNGKey(2), t1, (0.0,),
                                  (gt.NoChange,), d1)
        np.testing.assert_allclose(float(w1 + w2), 0.0, atol=1e-10)
        assert t2.get_choices().allclose(trace.get_choices(), atol=1e-12)

    def test_recurse_leveled_project_partition(self):
        from gen_tpu import RecurseLeveled

        B = 2

        @gen
        def production(u):
            v = gt.normal(u, 1.0) @ "v"
            branch = gt.bernoulli(0.4) @ "branch"
            return (v, jnp.where(branch, 2, 0),
                    jnp.stack([v * 0.5, -v * 0.5]))

        @gen
        def aggregation(v, child_ws, nchild):
            mask = jnp.arange(B) < nchild
            return v + jnp.sum(jnp.where(mask, child_ws, 0.0))

        fn = RecurseLeveled(production, aggregation, B, 3,
                            w_example=jnp.asarray(0.0))
        trace = fn.simulate(KEY, (0.0,))
        sel = select(*[(i, "production", "v") for i in range(fn.n_nodes)])
        total = (float(trace.project(sel))
                 + float(trace.project(sel.complement())))
        np.testing.assert_allclose(total, float(trace.get_score()),
                                   rtol=1e-10)
