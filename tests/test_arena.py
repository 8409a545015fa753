"""UnfoldArena: recompile-free SMC (one compiled program for the whole
filter), log-ML checked against the exact Kalman filter."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import gen, vector_choicemap
from gen_tpu.combinators import UnfoldArena, smc_run

KEY = jax.random.PRNGKey(0)


@gen
def ssm_kernel(t, prev):
    x = gt.normal(0.8 * prev, 0.5) @ "x"
    gt.normal(x, 0.3) @ "y"
    return x


arena = UnfoldArena(ssm_kernel, max_length=16)


def _data(T=10, seed=3):
    rng = np.random.default_rng(seed)
    x = 0.0
    ys = []
    for _ in range(T):
        x = 0.8 * x + 0.5 * rng.standard_normal()
        ys.append(x + 0.3 * rng.standard_normal())
    return np.asarray(ys)


def _kalman_lml(ys):
    A, Q, R = 0.8, 0.25, 0.09
    m, v, lml = 0.0, 0.0, 0.0
    for t, y in enumerate(ys):
        pm, pv = (A * m, A * A * v + Q) if t else (0.0, Q)
        S = pv + R
        lml += -0.5 * math.log(2 * math.pi * S) - 0.5 * (y - pm) ** 2 / S
        K = pv / S
        m, v = pm + K * (y - pm), (1 - K) * pv
    return lml


def test_extend_is_single_program():
    """Extension at different active lengths reuses one compiled program."""
    obs = gt.choicemap(y=0.5)
    trace, w0 = arena.init(KEY, 0.0, (), obs)

    ext = jax.jit(lambda k, tr: arena.extend(k, tr, gt.choicemap(y=0.1)))
    tr1, w1 = ext(jax.random.PRNGKey(1), trace)
    after_first = ext._cache_size()
    tr2, w2 = ext(jax.random.PRNGKey(2), tr1)
    tr3, w3 = ext(jax.random.PRNGKey(3), tr2)
    # the eager->jit boundary may add one entry; steady-state extensions at
    # different active lengths reuse ONE compiled program
    assert ext._cache_size() <= after_first + 1
    assert int(tr3.t_active) == 4
    # score is the sum over active slots only
    total = float(w0) if False else None
    x_vals = [float(tr3.subtraces.get_choices()["x"][i]) for i in range(4)]
    expected = 0.0
    prev = 0.0
    for t in range(4):
        yv = 0.5 if t == 0 else 0.1
        from scipy import stats
        expected += stats.norm.logpdf(x_vals[t], 0.8 * prev, 0.5)
        expected += stats.norm.logpdf(yv, x_vals[t], 0.3)
        prev = x_vals[t]
    np.testing.assert_allclose(float(tr3.get_score()), expected, rtol=1e-10)


def test_smc_run_matches_kalman():
    ys = _data(T=10)
    obs = vector_choicemap(10, y=jnp.asarray(ys))
    lmls = []
    run = jax.jit(lambda k: smc_run(k, arena, 0.0, (), obs, 3000)[2])
    for s in range(5):
        lmls.append(float(run(jax.random.PRNGKey(s))))
    np.testing.assert_allclose(np.mean(lmls), _kalman_lml(ys), atol=0.08)


def test_to_unfold_trace():
    trace = arena.simulate(KEY, (5, 0.0))
    utr = trace.to_unfold_trace()
    assert utr.length == 5
    np.testing.assert_allclose(float(utr.get_score()),
                               float(trace.get_score()), rtol=1e-12)
    # full GFI available on the converted trace
    w = utr.project(gt.ALL)
    np.testing.assert_allclose(float(w), float(utr.get_score()), rtol=1e-12)
