"""Profiling & timing utilities.

The reference has no built-in profiling (SURVEY.md §5.1: examples use
Julia's @time ad hoc). Here: a context manager over ``jax.profiler`` (view
traces in XProf/TensorBoard), and a wall-clock timer that blocks on device
completion so asynchronous dispatch doesn't lie."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/gen_tpu_profile"):
    """Capture an XLA device trace: ``with profile_trace(dir): run()`` then
    inspect with XProf / TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "block", results: dict = None):
    """Wall-clock a block, blocking on async device work at exit."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        jax.effects_barrier() if hasattr(jax, "effects_barrier") else None
        (jax.block_until_ready(out["value"])
         if "value" in out else None)
        elapsed = time.perf_counter() - t0
        out["seconds"] = elapsed
        if results is not None:
            results[label] = elapsed


def time_fn(fn, *args, warmup: int = 1, iters: int = 10, **kwargs):
    """Time a jitted function: compile separately, then average iters."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
