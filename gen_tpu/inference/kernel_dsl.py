"""Composite MCMC kernel DSL.

Reference: /root/reference/src/inference/kernel_dsl.jl (226 LoC: @pkern,
@kern with for/if/let/mixture blocks, @rkern/reversal auto-derivation,
stationarity checks under check=true).

Here a *kernel* is any callable ``(key, trace, *args) → (trace, aux)`` that
leaves the target distribution invariant. Composition is ordinary Python:
``seq``, ``mixture``, ``repeat``, ``cond_kernel`` — each returns another
kernel, so the full composite jits/vmaps like a primitive one. ``reversal``
mirrors the reference's reversal algebra (reverse statement order, reverse
loop ranges, swap proposals' reversals)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap

_REVERSALS = {}


def primitive_kernel(fn=None, reversal_fn=None):
    """Declare a stationary primitive kernel (the reference's @pkern).
    Optionally register its reversal (@rkern)."""
    def deco(f):
        if reversal_fn is not None:
            _REVERSALS[f] = reversal_fn
            _REVERSALS[reversal_fn] = f
        else:
            _REVERSALS.setdefault(f, f)  # self-reversal by default
        return f
    return deco(fn) if fn is not None else deco


def reversal(kernel):
    """The reversal of a kernel (reference kernel_dsl.jl:186-226). Built-in
    kernels (mh, hmc, mala, elliptical_slice) are their own reversals."""
    if kernel in _REVERSALS:
        return _REVERSALS[kernel]
    rev = getattr(kernel, "_reversal", None)
    if rev is not None:
        return rev
    return kernel  # stationary kernels default to self-reversal


def _set_reversal(k, rev):
    k._reversal = rev
    rev._reversal = k
    return k


def seq(*kernels):
    """Sequential composition; reversal = reversed sequence of reversals."""
    def composite(key, trace, *args):
        accepted = []
        for i, k in enumerate(kernels):
            key, sub = jax.random.split(key)
            trace, aux = k(sub, trace, *args)
            accepted.append(aux)
        return trace, accepted

    def composite_rev(key, trace, *args):
        accepted = []
        for i, k in enumerate(reversed(kernels)):
            key, sub = jax.random.split(key)
            trace, aux = reversal(k)(sub, trace, *args)
            accepted.append(aux)
        return trace, accepted

    return _set_reversal(composite, composite_rev)


def repeat(n: int, kernel):
    """Apply a kernel n times; reversal = repeat(n, reversal(kernel))."""
    def composite(key, trace, *args):
        aux = None
        for _ in range(n):
            key, sub = jax.random.split(key)
            trace, aux = kernel(sub, trace, *args)
        return trace, aux

    def composite_rev(key, trace, *args):
        aux = None
        rk = reversal(kernel)
        for _ in range(n):
            key, sub = jax.random.split(key)
            trace, aux = rk(sub, trace, *args)
        return trace, aux

    return _set_reversal(composite, composite_rev)


def for_range(n: int, make_kernel: Callable):
    """The reference's ``@kern for i in 1:n`` block (kernel_dsl.jl:118-226):
    apply ``make_kernel(i)`` for i = 0..n-1 in order. The reversal reverses
    BOTH the loop range and each body kernel — ``reversal(for_range(n, f))``
    applies ``reversal(f(i))`` for i = n-1..0 — which is what makes a
    position-sweep kernel usable inside involutive/annealed constructions
    where the reverse-order sweep is required."""
    kernels = [make_kernel(i) for i in range(n)]

    def composite(key, trace, *args):
        aux = []
        for k in kernels:
            key, sub = jax.random.split(key)
            trace, a = k(sub, trace, *args)
            aux.append(a)
        return trace, aux

    def composite_rev(key, trace, *args):
        aux = []
        for k in reversed(kernels):
            key, sub = jax.random.split(key)
            trace, a = reversal(k)(sub, trace, *args)
            aux.append(a)
        return trace, aux

    return _set_reversal(composite, composite_rev)


def mixture(probs: Sequence[float], kernels: Sequence[Callable]):
    """Choose a kernel at random each step (stationary if each component
    is); self-reversal uses component reversals with the same probs
    (reference kernel_dsl.jl mixture blocks).

    Under jit/vmap the component index is traced, so every component runs
    and the result is selected branchlessly (valid MH: the selection is
    independent of the outcomes); eagerly only the chosen component runs."""
    probs = jnp.asarray(probs)

    def _make(comps):
        def composite(key, trace, *args):
            k_sel, k_run = jax.random.split(key)
            idx = jax.random.categorical(k_sel, jnp.log(probs))
            if isinstance(idx, jax.core.Tracer):
                outs = [c(jax.random.fold_in(k_run, i), trace, *args)
                        for i, c in enumerate(comps)]
                traces = [o[0] for o in outs]
                picked = jax.tree_util.tree_map(
                    lambda *xs: jnp.select(
                        [idx == i for i in range(len(xs))],
                        [jnp.asarray(x) for x in xs]), *traces)
                aux = jnp.select([idx == i for i in range(len(outs))],
                                 [jnp.asarray(o[1]) for o in outs])
                return picked, aux
            return comps[int(idx)](k_run, trace, *args)
        return composite

    fwd = _make(list(kernels))
    bwd = _make([reversal(k) for k in kernels])
    return _set_reversal(fwd, bwd)


def cond_kernel(pred_fn: Callable, if_kernel, else_kernel):
    """Apply if_kernel when pred_fn(trace) is true (host-level predicate on
    concrete traces; the reference's @kern if-blocks)."""
    def composite(key, trace, *args):
        if bool(pred_fn(trace)):
            return if_kernel(key, trace, *args)
        return else_kernel(key, trace, *args)

    def composite_rev(key, trace, *args):
        if bool(pred_fn(trace)):
            return reversal(if_kernel)(key, trace, *args)
        return reversal(else_kernel)(key, trace, *args)

    return _set_reversal(composite, composite_rev)


def check_observations(choices: ChoiceMap, observations: ChoiceMap):
    """Verify a kernel preserved the observed addresses (reference
    kernel_dsl.jl:3-11)."""
    for path, value in observations.leaf_items():
        if not choices.has_value(path):
            raise RuntimeError(f"kernel deleted observation at {path!r}")
        got = choices.get_value(path)
        if not jnp.allclose(jnp.asarray(got), jnp.asarray(value)):
            raise RuntimeError(
                f"kernel changed observation at {path!r}: {got} != {value}")


def checked(kernel, observations: ChoiceMap):
    """Wrap a kernel with observation-preservation checking (the reference's
    ``check=true`` mode)."""
    def wrapped(key, trace, *args):
        new_trace, aux = kernel(key, trace, *args)
        check_observations(new_trace.get_choices(), observations)
        return new_trace, aux
    return wrapped
