"""Fused Pallas FSM-NUTS (ops/nuts_fused.py): the ACTUAL kernel logic runs
on CPU via the Pallas TPU interpreter with injected host-side randomness
and must reproduce the XLA reference ``inference.nuts_fsm.nuts_fsm``
consuming the same randomness — every U-turn decision, checkpoint,
candidate take, tree merge, and trajectory completion, tick for tick.
On-core-PRNG statistics remain TPU-only (benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference.nuts_fsm import nuts_fsm
from gen_tpu.inference.target import FlatTarget
from gen_tpu.ops.nuts_fused import nuts_chains_fused

KEY = jax.random.PRNGKey(0)


def _injected(key, ticks, n, d):
    ks = jax.random.split(key, 5)
    z = jax.random.normal(ks[0], (ticks, n, d))
    us = [jnp.clip(jax.random.uniform(ks[i], (ticks, n)), 1e-6, 1.0 - 1e-6)
          for i in range(1, 5)]
    return (z, *us)


def _reference_fsm_injected(logp, values0, rng, eps, ticks, max_depth,
                            inv_mass, collect_idx):
    vag = jax.value_and_grad(logp)
    n = values0.shape[0]
    z, u0, ut, ub, ud = rng

    def one(i):
        inj = (z[:, i], u0[:, i], ut[:, i], ub[:, i], ud[:, i])
        return nuts_fsm(jax.random.PRNGKey(0), vag, values0[i], eps, ticks,
                        max_depth=max_depth, inv_mass_diag=inv_mass,
                        num_sample_slots=8, injected_rng=inj,
                        collect_idx=collect_idx)

    res, (hist, hist_cnt) = jax.vmap(one)(jnp.arange(n))
    return res, hist.T, hist_cnt.T


def test_interpret_kernel_matches_fsm_reference_exactly():
    with jax.enable_x64(False):
        _run_interpret_gaussian()


def _run_interpret_gaussian():
    sds = jnp.array([1.0, 3.0, 0.5])

    def logp(x):
        return -0.5 * jnp.sum((x / sds) ** 2)

    n, d, ticks, max_depth = 256, 3, 48, 5
    vals0 = jax.random.normal(KEY, (n, d)) * sds
    inv_mass = sds ** 2
    rng = _injected(jax.random.PRNGKey(7), ticks, n, d)

    vals_k, hist_k, hcnt_k, cnt_k, stats_k = nuts_chains_fused(
        jax.random.PRNGKey(1), logp, vals0, num_ticks=ticks, eps=0.6,
        max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=1,
        injected_rng=rng, interpret=True)
    res_r, hist_r, hcnt_r = _reference_fsm_injected(
        logp, vals0, rng, 0.6, ticks, max_depth, inv_mass, 1)

    # trajectory-count and divergence bookkeeping must agree exactly
    np.testing.assert_array_equal(np.asarray(cnt_k), np.asarray(res_r.counts))
    np.testing.assert_array_equal(np.asarray(hcnt_k), np.asarray(hcnt_r))
    np.testing.assert_array_equal(np.asarray(stats_k["num_divergent"]),
                                  np.asarray(res_r.num_divergent))
    np.testing.assert_allclose(np.asarray(vals_k), np.asarray(res_r.theta),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hist_k), np.asarray(hist_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats_k["mean_accept"]),
                               np.asarray(res_r.mean_accept),
                               rtol=1e-4, atol=1e-5)
    assert int(cnt_k.min()) > 0


def test_interpret_kernel_scalarized_model():
    """Kernel on the full GFI assess-logp via scalarize (the production
    configuration), exact against the XLA FSM."""
    with jax.enable_x64(False):
        _run_interpret_scalarized()


def _run_interpret_scalarized():
    n_pts = 50
    xs = jnp.linspace(-3.0, 3.0, n_pts)
    rng0 = np.random.default_rng(0)
    ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(rng0.standard_normal(n_pts))
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)

    @gen
    def m(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        gt.normal_linear(X, jnp.stack([slope, intercept]),
                         jnp.exp(log_noise)) @ "ys"

    one, _ = m.generate(KEY, (X,), choicemap(ys=ys))
    target = FlatTarget(one, select("slope", "intercept", "log_noise"))

    n, d, ticks, max_depth = 256, 3, 32, 5
    vals0 = 0.05 * jax.random.normal(KEY, (n, d))
    rng = _injected(jax.random.PRNGKey(3), ticks, n, d)

    vals_k, hist_k, hcnt_k, cnt_k, _ = nuts_chains_fused(
        jax.random.PRNGKey(1), target.logp, vals0, num_ticks=ticks,
        eps=0.03, max_depth=max_depth, collect_idx=0, injected_rng=rng,
        interpret=True)
    res_r, hist_r, hcnt_r = _reference_fsm_injected(
        target.logp, vals0, rng, 0.03, ticks, max_depth, jnp.ones(d), 0)

    # the scalarized staging reorders float arithmetic (rtol accordingly);
    # discrete bookkeeping must still agree on essentially every chain
    agree = np.mean(np.asarray(cnt_k) == np.asarray(res_r.counts))
    assert agree > 0.98, agree
    match = np.isclose(np.asarray(vals_k), np.asarray(res_r.theta),
                       rtol=2e-3, atol=2e-3).all(axis=1)
    assert np.mean(match) > 0.98, np.mean(match)


def test_fallback_gaussian_moments():
    """XLA fallback path (vmapped nuts_fsm): anisotropic Gaussian moments
    recovered from the per-tick history. x64 off: the entry point is an
    f32 program (as on TPU) and the suite-wide x64 default would promote
    the closure constants."""
    with jax.enable_x64(False):
        _run_fallback_gaussian_moments()


def _run_fallback_gaussian_moments():
    sds = jnp.array([1.0, 4.0])

    def logp(x):
        return -0.5 * jnp.sum((x / sds) ** 2)

    vals0 = jax.random.normal(KEY, (128, 2)) * sds
    vals, hist, hcnt, cnt, stats = nuts_chains_fused(
        jax.random.PRNGKey(2), logp, vals0, num_ticks=600, eps=0.5,
        max_depth=6, inv_mass_diag=sds ** 2, collect_idx=1,
        use_pallas=False)
    assert vals.shape == (128, 2)
    assert hist.shape == (600, 128)
    assert hcnt.shape == (600, 128)
    s = np.asarray(hist)[200:]
    assert abs(s.mean()) < 0.35
    np.testing.assert_allclose(s.std(), 4.0, rtol=0.1)
    assert int(cnt.min()) > 0
    np.testing.assert_array_equal(np.asarray(hcnt[-1]), np.asarray(cnt))
    assert float(jnp.mean(stats["mean_accept"])) > 0.6


def test_chunked_driver_stitches_streams():
    """Chunked driver: cumulative counts nondecreasing across chunk
    boundaries, final counts equal the last count row, extraction works on
    the stitched streams, and moments stay correct."""
    from gen_tpu.ops.nuts_fused import (nuts_chains_fused_chunked,
                                        extract_completed_draws)
    with jax.enable_x64(False):
        def logp(x):
            return -0.5 * jnp.sum(x * x)

        vals0 = jax.random.normal(KEY, (64, 2)) * 2.0
        vals, hist, hcnt, cnt, stats = nuts_chains_fused_chunked(
            jax.random.PRNGKey(3), logp, vals0, num_ticks=600, eps=0.5,
            chunk_ticks=150, max_depth=6, collect_idx=1, use_pallas=False)
        assert hist.shape == (600, 64) and hcnt.shape == (600, 64)
        dif = np.diff(np.asarray(hcnt), axis=0)
        assert (dif >= 0).all()
        np.testing.assert_array_equal(np.asarray(hcnt[-1]), np.asarray(cnt))
        m = int(cnt.min())
        assert m > 10
        draws = np.asarray(extract_completed_draws(hist, hcnt, m))
        assert draws.shape == (m, 64)
        assert abs(draws[m // 4:].mean()) < 0.3
        np.testing.assert_allclose(draws[m // 4:].std(), 1.0, rtol=0.12)
