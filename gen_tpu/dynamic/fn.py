"""GenFn: the ``@gen`` traced-interpreter generative function.

Analogue of Gen.jl's ``DynamicDSLFunction`` (/root/reference/src/dynamic/
dynamic.jl:11-45) — but where the reference has *two* modeling languages (a
slow dynamic interpreter and a compiled static IR), here there is one: the
interpreter stages into XLA under ``jax.jit``, which plays the role of the
reference's generated straight-line code (src/static_ir/simulate.jl:53-89).

Gradient methods (``choice_gradients`` / ``param_gradients``) are
implemented as ``jax.grad`` of the key-free ``assess`` re-execution — the
functional analogue of the reference's ReverseDiff tape replay
(src/dynamic/backprop.jl:372-394). Analytic per-distribution logpdf
derivatives fall out of XLA autodiff of each ``logpdf``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap
from ..diff import UnknownChange
from ..gfi import GenerativeFunction
from ..selection import Selection
from .handlers import (AssessHandler, GenerateHandler, RegenerateHandler,
                       SimulateHandler, UpdateHandler, active_handler)
from .params import current_params
from .trace import ChoiceRecord, DynamicTrace


class GenFn(GenerativeFunction):
    """A generative function defined by a traced Python body."""

    def __init__(self, fn, name: Optional[str] = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "gen_fn")
        self.params: Dict[str, Any] = {}
        self.params_grad: Dict[str, Any] = {}
        # trailing default arguments (reference: optional args, test/
        # optional_args.jl; src/dsl/dsl.jl argument parsing with defaults).
        # Omitted trailing args are filled with the declared defaults so the
        # trace stores canonical full args — and, per the reference's
        # update/regenerate contract (gen_fn_interface.jl:310-318 note),
        # omitting an optional arg in update overwrites the old value with
        # the DEFAULT.
        import inspect
        try:
            sig = inspect.signature(fn)
            ps = list(sig.parameters.values())
            self._variadic = any(
                p.kind is inspect.Parameter.VAR_POSITIONAL for p in ps)
            self._n_positional = sum(
                p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                           inspect.Parameter.POSITIONAL_OR_KEYWORD)
                for p in ps)
            self._defaults = tuple(
                p.default for p in ps
                if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                              inspect.Parameter.POSITIONAL_OR_KEYWORD)
                and p.default is not inspect.Parameter.empty)
        except (ValueError, TypeError):
            self._variadic, self._n_positional, self._defaults = True, 0, ()

    def fill_args(self, args: Tuple) -> Tuple:
        """Append declared defaults for omitted trailing arguments."""
        args = tuple(args)
        if self._variadic or not self._defaults \
                or len(args) >= self._n_positional:
            return args
        missing = self._n_positional - len(args)
        if missing > len(self._defaults):
            return args  # too few args — let Python raise naturally
        return args + self._defaults[len(self._defaults) - missing:]

    def run_body(self, args):
        try:
            return self.fn(*args)
        except jax.errors.TracerBoolConversionError as e:
            raise RuntimeError(
                f"model {self.name!r} branches on a traced value inside "
                "jit/vmap/scan. Data-dependent control flow needs a "
                "fixed-shape formulation: use the Switch combinator, "
                "jnp.where on values, or a masked arena (see "
                "examples/coal.py). Eager execution (outside jit) supports "
                "arbitrary Python control flow.") from e

    def get_params(self):
        return tuple(self.params.keys())

    def accepts_output_grad(self) -> bool:
        return True

    def has_argument_grads(self):
        # Args with inexact dtype are differentiable; the reference instead
        # uses explicit (grad) annotations (src/dsl/dsl.jl:5-9).
        return None

    def __repr__(self):
        return f"@gen {self.name}"

    # -- GFI --------------------------------------------------------------

    def simulate(self, key, args: Tuple) -> DynamicTrace:
        args = self.fill_args(args)
        with SimulateHandler(key, current_params(self)) as h:
            retval = self.run_body(args)
        return DynamicTrace(self, args, retval, h.score, h.noise, h.records)

    def generate(self, key, args: Tuple,
                 constraints: Optional[ChoiceMap] = None):
        constraints = constraints if constraints is not None else ChoiceMap()
        args = self.fill_args(args)
        with GenerateHandler(key, constraints, current_params(self)) as h:
            retval = self.run_body(args)
        trace = DynamicTrace(self, args, retval, h.score, h.noise, h.records)
        return trace, h.weight

    def assess(self, args: Tuple, choices: ChoiceMap, params=None):
        args = self.fill_args(args)
        with AssessHandler(choices, current_params(self) if params is None else params) as h:
            retval = self.run_body(args)
            unconsumed = [a for a in choices.addresses()
                          if not h.visitor.covers(a)]
        if unconsumed:
            raise ValueError(
                f"assess: choices at {unconsumed!r} were not visited "
                f"(reference: src/dynamic/assess.jl:58-62)")
        return h.weight, retval

    def project(self, trace: DynamicTrace, selection: Selection):
        return trace.project(selection)

    def update(self, key, trace: DynamicTrace, args: Tuple, argdiffs: Tuple,
               constraints: ChoiceMap):
        args = self.fill_args(args)
        with UpdateHandler(key, trace, constraints, current_params(self)) as h:
            retval = self.run_body(args)
        weight = h.weight
        discard = h.discard
        # deletion pass: subtract scores of prev records not re-visited and
        # add their choices to the discard (reference update.jl:122-180)
        visited = h.visitor
        for path, rec in trace.records.items():
            if path not in visited.paths:
                weight = weight - rec.score
                if isinstance(rec, ChoiceRecord):
                    discard.set_value(path, rec.value)
                else:
                    sub_choices = rec.subtrace.get_choices()
                    if not sub_choices.is_empty():
                        discard.set_submap(path, sub_choices)
        unconsumed = [a for a in constraints.addresses()
                      if not visited.covers(a)]
        if unconsumed:
            raise ValueError(
                f"update: did not visit constraints at {unconsumed!r} "
                f"(reference: src/dynamic/update.jl:191-193)")
        new_trace = DynamicTrace(self, args, retval, h.score, h.noise,
                                 h.records)
        return new_trace, weight, UnknownChange, discard

    def regenerate(self, key, trace: DynamicTrace, args: Tuple,
                   argdiffs: Tuple, selection: Selection):
        args = self.fill_args(args)
        with RegenerateHandler(key, trace, selection, current_params(self)) as h:
            retval = self.run_body(args)
        weight = h.weight
        # deleted calls: subtract their noise (reference regenerate.jl:104-131)
        for path, rec in trace.records.items():
            if path not in h.visitor.paths and not isinstance(rec, ChoiceRecord):
                weight = weight - rec.noise
        new_trace = DynamicTrace(self, args, retval, h.score, h.noise,
                                 h.records)
        return new_trace, weight, UnknownChange

def gen(fn=None, **kwargs):
    """Decorator: ``@gen`` turns a Python function into a
    :class:`GenFn`. The body may trace calls with ``dist(args) @ "addr"``,
    ``other_gen_fn(args) @ "addr"``, or ``trace_at(addr, fn, *args)``."""
    if fn is None:
        return lambda f: GenFn(f, **kwargs)
    return GenFn(fn, **kwargs)


def param(name: str):
    """Read a trainable parameter inside a model body (the reference's
    ``@param``, src/dsl/dsl.jl:139-152)."""
    return active_handler().get_param(name)


# -- parameter store API (reference: src/builtin_optimization.jl:1-67) ----

def init_param(fn: GenFn, name: str, value):
    fn.params[name] = jnp.asarray(value, dtype=jnp.result_type(float)) \
        if not hasattr(value, "dtype") else value
    fn.params_grad[name] = None


def get_param(fn: GenFn, name: str):
    return fn.params[name]


def set_param(fn: GenFn, name: str, value):
    fn.params[name] = value


def get_param_grad(fn: GenFn, name: str):
    g = fn.params_grad.get(name)
    if g is None:
        return jax.tree_util.tree_map(jnp.zeros_like, fn.params[name])
    return g


def zero_param_grad(fn: GenFn, name: str):
    fn.params_grad[name] = None


def set_param_grad(fn: GenFn, name: str, grad):
    fn.params_grad[name] = grad
