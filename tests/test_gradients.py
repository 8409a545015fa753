"""Finite-difference checks for choice_gradients / param_gradients
(reference: test/dsl/dynamic_dsl.jl:280-415)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

import gen_tpu as gt
from gen_tpu import choicemap, gen, init_param, param, select

KEY = jax.random.PRNGKey(0)
DX = 1e-6


@gen
def reg_model(x):
    slope = gt.normal(0.0, 2.0) @ "slope"
    intercept = gt.normal(0.0, 2.0) @ "intercept"
    y = gt.normal(slope * x + intercept, 0.5) @ "y"
    return y


def _logjoint(slope, intercept, y, x=1.3):
    return (stats.norm.logpdf(slope, 0, 2) + stats.norm.logpdf(intercept, 0, 2)
            + stats.norm.logpdf(y, slope * x + intercept, 0.5))


def test_choice_gradients_finite_diff():
    tr, _ = reg_model.generate(KEY, (1.3,),
                               choicemap(slope=0.4, intercept=-0.2, y=1.0))
    arg_grads, values, grads = reg_model.choice_gradients(
        tr, select("slope", "intercept"))
    np.testing.assert_allclose(values["slope"], 0.4)
    fd_slope = (_logjoint(0.4 + DX, -0.2, 1.0) - _logjoint(0.4 - DX, -0.2, 1.0)) / (2 * DX)
    fd_int = (_logjoint(0.4, -0.2 + DX, 1.0) - _logjoint(0.4, -0.2 - DX, 1.0)) / (2 * DX)
    np.testing.assert_allclose(grads["slope"], fd_slope, rtol=1e-5)
    np.testing.assert_allclose(grads["intercept"], fd_int, rtol=1e-5)
    # unselected choice gets no gradient entry
    assert not grads.has_value("y")
    # arg grad (x is differentiable)
    fd_x = (_logjoint(0.4, -0.2, 1.0, 1.3 + DX) - _logjoint(0.4, -0.2, 1.0, 1.3 - DX)) / (2 * DX)
    np.testing.assert_allclose(arg_grads[0], fd_x, rtol=1e-5)


def test_choice_gradients_with_retgrad():
    tr, _ = reg_model.generate(KEY, (1.3,),
                               choicemap(slope=0.4, intercept=-0.2, y=1.0))
    # retval = y; objective = logp + 2.0*y; y not selected -> same grads for
    # slope/intercept as without retgrad only via logp channel... y IS retval
    # but y's value is fixed, so retgrad shifts nothing for slope/intercept.
    _, _, g0 = reg_model.choice_gradients(tr, select("slope"))
    _, _, g1 = reg_model.choice_gradients(tr, select("slope"), retgrad=2.0)
    np.testing.assert_allclose(g0["slope"], g1["slope"], rtol=1e-12)

    # when the selected choice IS the retval, retgrad adds directly
    _, _, g2 = reg_model.choice_gradients(tr, select("y"), retgrad=2.0)
    _, _, g3 = reg_model.choice_gradients(tr, select("y"))
    np.testing.assert_allclose(g2["y"], np.asarray(g3["y"]) + 2.0, rtol=1e-8)


def test_choice_gradients_hierarchical():
    @gen
    def inner(mu):
        return gt.normal(mu, 1.0) @ "a"

    @gen
    def outer():
        m = gt.normal(0.0, 1.0) @ "m"
        return inner(m) @ "sub"

    cons = choicemap(m=0.3)
    cons.set_value(("sub", "a"), 0.9)
    tr, _ = outer.generate(KEY, (), cons)
    _, values, grads = outer.choice_gradients(tr, select(("sub", "a")))
    fd = (stats.norm.logpdf(0.9 + DX, 0.3, 1) - stats.norm.logpdf(0.9 - DX, 0.3, 1)) / (2 * DX)
    np.testing.assert_allclose(grads[("sub", "a")], fd, rtol=1e-5)


def test_param_gradients_finite_diff():
    @gen
    def pmodel():
        theta = param("theta")
        return gt.normal(theta, 1.0) @ "x"

    init_param(pmodel, "theta", 0.5)
    tr, _ = pmodel.generate(KEY, (), choicemap(x=1.2))
    _, all_pgrads = pmodel.param_gradients(tr)
    pgrads = all_pgrads[pmodel]
    fd = (stats.norm.logpdf(1.2, 0.5 + DX, 1) - stats.norm.logpdf(1.2, 0.5 - DX, 1)) / (2 * DX)
    np.testing.assert_allclose(pgrads["theta"], fd, rtol=1e-5)
    # scale factor applies to param grads
    _, pg2all = pmodel.param_gradients(tr, scale_factor=3.0)
    pg2 = pg2all[pmodel]
    np.testing.assert_allclose(pg2["theta"], 3 * np.asarray(pgrads["theta"]),
                               rtol=1e-10)


def test_accumulate_param_gradients():
    @gen
    def pmodel2():
        theta = param("theta")
        return gt.normal(theta, 1.0) @ "x"

    init_param(pmodel2, "theta", 0.0)
    tr, _ = pmodel2.generate(KEY, (), choicemap(x=2.0))
    pmodel2.accumulate_param_gradients(tr)
    pmodel2.accumulate_param_gradients(tr)
    g = gt.get_param_grad(pmodel2, "theta")
    np.testing.assert_allclose(g, 2 * 2.0, rtol=1e-10)  # d/dθ logN(2;θ,1) = 2-θ
    gt.zero_param_grad(pmodel2, "theta")
    np.testing.assert_allclose(gt.get_param_grad(pmodel2, "theta"), 0.0)


def test_vector_param_gradients():
    @gen
    def vmodel():
        w = param("w")  # vector param
        return gt.normal(jnp.sum(w), 1.0) @ "x"

    init_param(vmodel, "w", jnp.array([0.1, 0.2, 0.3]))
    tr, _ = vmodel.generate(KEY, (), choicemap(x=1.0))
    _, all_pg = vmodel.param_gradients(tr)
    pgrads = all_pg[vmodel]
    expected = (1.0 - 0.6) * np.ones(3)
    np.testing.assert_allclose(pgrads["w"], expected, rtol=1e-8)


def test_param_gradients_through_map_kernel():
    """Gradients reach trainable params of combinator kernels via the trace
    walk (reference recursion: backprop.jl:336-370)."""
    from gen_tpu import Map, vector_choicemap

    @gen
    def pk(x):
        theta = param("theta")
        gt.normal(theta * x, 1.0) @ "y"

    init_param(pk, "theta", 0.5)
    mp = Map(pk)
    xs = jnp.array([1.0, 2.0])
    trm, _ = mp.generate(KEY, (xs,),
                         vector_choicemap(2, y=jnp.array([1.0, 2.0])))
    _, pgr = mp.param_gradients(trm)
    np.testing.assert_allclose(float(np.asarray(pgr[pk]["theta"])), 2.5,
                               rtol=1e-10)
