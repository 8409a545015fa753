"""Trainable-parameter plumbing.

The reference stores params in per-gen-fn Dicts and differentiates into them
via tape replay (/root/reference/src/builtin_optimization.jl:1-67,
src/dynamic/backprop.jl:185-211, recursing into callees at :336-370). Here
params still live on each ``GenFn`` (host-side store, reference-API parity),
but gradients are functional: ``param_gradients`` re-executes ``assess``
under a *parameter override context* that substitutes traced values for
every reachable gen fn's params, and ``jax.grad`` differentiates the bundle.
"""

from __future__ import annotations

import contextlib
from typing import Dict, List

_OVERRIDES: List[Dict[int, dict]] = []


@contextlib.contextmanager
def override_params(mapping: Dict[int, dict]):
    """mapping: id(gen_fn) -> params dict to use during this context."""
    _OVERRIDES.append(mapping)
    try:
        yield
    finally:
        _OVERRIDES.pop()


def current_params(fn) -> dict:
    for mapping in reversed(_OVERRIDES):
        if id(fn) in mapping:
            return mapping[id(fn)]
    return fn.params


def collect_param_fns(trace, acc=None) -> list:
    """All generative functions with trainable params reachable from a
    trace (the trace's own fn, call subtraces, combinator kernels)."""
    if acc is None:
        acc = []

    def add(fn):
        if fn is not None and getattr(fn, "params", None) and fn not in acc:
            acc.append(fn)

    fn = trace.get_gen_fn()
    add(fn)
    # dynamic traces: recurse into call records
    records = getattr(trace, "records", None)
    if records is not None:
        for rec in records.values():
            sub = getattr(rec, "subtrace", None)
            if sub is not None:
                collect_param_fns(sub, acc)
    # vector combinator traces: recurse into the batched subtrace
    subtraces = getattr(trace, "subtraces", None)
    if subtraces is not None:
        collect_param_fns(subtraces, acc)
    # wrapper traces (call_at, switch, ...)
    inner = getattr(trace, "inner_trace", None)
    if inner is not None:
        collect_param_fns(inner, acc)
    return acc
