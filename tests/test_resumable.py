"""Preemption-safe resumable inference (gen_tpu/inference/resumable.py —
SURVEY §5.3 failure detection / elastic recovery; no reference analogue).

Contracts under test:
1. crash-and-resume reproduces the uninterrupted run BIT FOR BIT
   (deterministic segment key schedule + atomic checkpoints),
2. a transient numerical failure is detected by the health check, rolled
   back, and re-run with fresh randomness (the run completes),
3. a deterministic failure raises after max_retries with the segment
   pinned.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import hmc_chains
from gen_tpu.inference.resumable import resumable_run
from gen_tpu.inference.target import FlatTarget


def _make_segment_fn(n_chains=32, steps_per_seg=10):
    xs = jnp.linspace(-2.0, 2.0, 20)
    rng = np.random.default_rng(0)
    ys = 0.5 * xs + 0.3 * jnp.asarray(rng.standard_normal(20))

    @gen
    def model(xs):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        gt.normal(slope * xs + intercept, 0.5) @ "ys"

    obs = choicemap(ys=ys)
    sel = select("slope", "intercept")
    trace, _ = model.generate(jax.random.PRNGKey(9), (xs,), obs)
    target = FlatTarget(trace, sel)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    traces, _ = jax.vmap(lambda k: model.generate(k, (xs,), obs))(keys)
    flat0 = jax.vmap(
        lambda tr: tr.get_choices().filter(sel).to_array())(traces)

    @jax.jit
    def segment(key, values):
        values, hist, _ = hmc_chains(key, target, values,
                                     n_steps=steps_per_seg, L=3, eps=0.05)
        return values, hist

    return segment, flat0


def test_crash_resume_bitwise_identical(tmp_path):
    segment, flat0 = _make_segment_fn()
    key = jax.random.PRNGKey(42)

    # uninterrupted reference run
    d1 = str(tmp_path / "uninterrupted")
    state_a, draws_a, info_a = resumable_run(d1, key, segment, flat0, 4)
    assert not info_a["resumed"]

    # "crashed" run: same workdir driven twice — first process dies after
    # segment 2 (simulated by only asking for 2 of 4 checkpoints via a
    # wrapper that raises), second process resumes
    d2 = str(tmp_path / "crashy")
    calls = {"n": 0}

    def dying_segment(key, values):
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")
        calls["n"] += 1
        return segment(key, values)

    with pytest.raises(KeyboardInterrupt):
        resumable_run(d2, key, dying_segment, flat0, 4)
    state_b, draws_b, info_b = resumable_run(d2, key, segment, flat0, 4)
    assert info_b["resumed"] and info_b["start_segment"] == 2

    np.testing.assert_array_equal(np.asarray(draws_a), np.asarray(draws_b))
    np.testing.assert_array_equal(np.asarray(state_a), np.asarray(state_b))


def test_transient_failure_rolls_back_and_heals(tmp_path):
    segment, flat0 = _make_segment_fn()
    key = jax.random.PRNGKey(7)
    poisoned = {"armed": True}

    def flaky_segment(k, values):
        values, hist = segment(k, values)
        if poisoned["armed"]:
            poisoned["armed"] = False      # transient: fails exactly once
            values = values.at[0, 0].set(jnp.nan)
        return values, hist

    state, draws, info = resumable_run(
        str(tmp_path / "flaky"), key, flaky_segment, flat0, 3, verbose=True)
    assert info["retries"] == [(0, 0)]
    assert np.all(np.isfinite(np.asarray(state)))
    assert np.asarray(draws).shape[0] == 30


def test_deterministic_failure_raises_with_segment(tmp_path):
    segment, flat0 = _make_segment_fn()

    def broken_segment(k, values):
        values, hist = segment(k, values)
        return values.at[0, 0].set(jnp.inf), hist

    with pytest.raises(RuntimeError, match="segment 0"):
        resumable_run(str(tmp_path / "broken"), jax.random.PRNGKey(0),
                      broken_segment, flat0, 2, max_retries=1)


def test_mismatched_schedule_refused(tmp_path):
    segment, flat0 = _make_segment_fn()
    d = str(tmp_path / "sched")
    resumable_run(d, jax.random.PRNGKey(0), segment, flat0, 2)
    with pytest.raises(ValueError, match="fresh workdir"):
        resumable_run(d, jax.random.PRNGKey(0), segment, flat0, 3)


def test_nan_in_draws_rolls_back(tmp_path):
    """A segment whose STATE is finite but whose DRAWS contain NaN must be
    rolled back (ADVICE r3: the draws are the artifact users consume)."""
    segment, flat0 = _make_segment_fn()
    poisoned = {"armed": True}

    def flaky_draws_segment(k, values):
        values, hist = segment(k, values)
        if poisoned["armed"]:
            poisoned["armed"] = False
            hist = hist.at[0, 0].set(jnp.nan)   # state stays finite
        return values, hist

    state, draws, info = resumable_run(
        str(tmp_path / "flakydraws"), jax.random.PRNGKey(7),
        flaky_draws_segment, flat0, 3)
    assert info["retries"] == [(0, 0)]
    assert np.all(np.isfinite(np.asarray(draws)))


def test_single_arg_health_check_still_works(tmp_path):
    segment, flat0 = _make_segment_fn()
    calls = {"n": 0}

    def check_state_only(state):
        calls["n"] += 1
        return bool(np.all(np.isfinite(np.asarray(state))))

    resumable_run(str(tmp_path / "onearg"), jax.random.PRNGKey(0), segment,
                  flat0, 2, health_check=check_state_only)
    assert calls["n"] == 2


def test_mismatched_key_or_state_refused(tmp_path):
    """Resuming with a different base key or state0 structure must be
    refused (ADVICE r3: silent continuation under a new schedule breaks
    the bit-for-bit contract)."""
    segment, flat0 = _make_segment_fn()
    d = str(tmp_path / "fp")
    resumable_run(d, jax.random.PRNGKey(0), segment, flat0, 2)
    with pytest.raises(ValueError, match="different base key"):
        resumable_run(d, jax.random.PRNGKey(1), segment, flat0, 2)
    with pytest.raises(ValueError, match="state0 structure"):
        resumable_run(d, jax.random.PRNGKey(0), segment,
                      flat0[:, :1], 2)


def test_fully_completed_run_reloads(tmp_path):
    segment, flat0 = _make_segment_fn()
    d = str(tmp_path / "done")
    key = jax.random.PRNGKey(3)
    _, draws_a, _ = resumable_run(d, key, segment, flat0, 2)
    # second invocation: nothing to run; draws reload from disk
    _, draws_b, info = resumable_run(d, key, segment, flat0, 2)
    assert info["start_segment"] == 2
    np.testing.assert_array_equal(np.asarray(draws_a), np.asarray(draws_b))
