"""Small parity suites mirroring reference test files: optional args
(test/optional_args.jl), diff propagation (test/diff.jl), splice, and the
three trace-call sugars (test/tilde_sugar.jl analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

import gen_tpu as gt
from gen_tpu import choicemap, gen, trace_at
from gen_tpu.diff import (Diffed, IntDiff, NoChange, UnknownChange,
                          get_diff, strip_diff)

KEY = jax.random.PRNGKey(0)


class TestOptionalArgs:
    def test_default_arguments(self):
        @gen
        def m(x, scale=2.0):
            return gt.normal(x, scale) @ "y"

        # omitted optional arg uses the default (reference
        # gen_fn_interface.jl:145-147 / test/optional_args.jl)
        tr = m.simulate(KEY, (1.0,))
        np.testing.assert_allclose(
            float(tr.get_score()),
            stats.norm.logpdf(float(tr["y"]), 1.0, 2.0), rtol=1e-10)
        tr2 = m.simulate(KEY, (1.0, 0.5))
        np.testing.assert_allclose(
            float(tr2.get_score()),
            stats.norm.logpdf(float(tr2["y"]), 1.0, 0.5), rtol=1e-10)


class TestDiffPropagation:
    def test_arithmetic(self):
        a = Diffed(2.0, NoChange)
        b = Diffed(3.0, UnknownChange)
        s = a + b
        assert strip_diff(s) == 5.0
        assert get_diff(s) is UnknownChange
        t = a * Diffed(4.0, NoChange)
        assert strip_diff(t) == 8.0
        assert get_diff(t) is NoChange
        u = a + 1.0  # plain values carry NoChange
        assert get_diff(u) is NoChange

    def test_indexing(self):
        v = Diffed(jnp.arange(4.0), NoChange)
        x = v[Diffed(2, NoChange)]
        assert get_diff(x) is NoChange
        y = v[Diffed(2, UnknownChange)]
        assert get_diff(y) is UnknownChange

    def test_intdiff(self):
        d = IntDiff(3)
        assert d.difference == 3


class TestCallSugars:
    def test_three_forms_equivalent(self):
        @gen
        def inner(mu):
            return gt.normal(mu, 1.0) @ "z"

        @gen
        def a():
            return gt.normal(0.0, 1.0) @ "x"

        @gen
        def b():
            return trace_at("x", gt.normal, 0.0, 1.0)

        ta = a.simulate(KEY, ())
        tb = b.simulate(KEY, ())
        np.testing.assert_allclose(float(ta["x"]), float(tb["x"]))
        np.testing.assert_allclose(float(ta.get_score()),
                                   float(tb.get_score()))

    def test_splice_params(self):
        @gen
        def inner():
            t = gt.param("theta")
            return gt.normal(t, 1.0) @ "z"

        gt.init_param(inner, "theta", 3.0)

        @gen
        def outer():
            v = inner.inline()  # splice: params resolve to inner's store
            return gt.normal(v, 0.5) @ "w"

        tr = outer.simulate(KEY, ())
        z = float(tr["z"])
        expected = (stats.norm.logpdf(z, 3.0, 1.0)
                    + stats.norm.logpdf(float(tr["w"]), z, 0.5))
        np.testing.assert_allclose(float(tr.get_score()), expected,
                                   rtol=1e-10)
