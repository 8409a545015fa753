"""Deterministic generative functions with custom incremental computation.

Reference: /root/reference/src/modeling_library/custom_determ.jl (207 LoC):
``CustomDetermGF`` (abstract: apply_with_state / update_with_state /
gradient_with_state), plus ``CustomUpdateGF`` and ``CustomGradientGF``
wrappers for plain functions. These gen fns make no random choices — score
0, empty choices — but participate in the GFI so models can embed cached
deterministic computations whose `update` is cheaper than recomputation.

Under XLA much of the reference's motivation (avoiding recomputation)
disappears — the compiler CSEs across update calls — but the *semantics*
(custom state threading, custom gradients) remain useful, e.g. wrapping a
hand-written Pallas kernel with a custom VJP."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..choice_map import ChoiceMap
from ..diff import UnknownChange
from ..gfi import GenerativeFunction, Trace
from ..selection import Selection


class CustomDetermGFTrace(Trace):
    __slots__ = ("gen_fn", "args", "retval", "state")

    def __init__(self, gen_fn, args, retval, state):
        self.gen_fn = gen_fn
        self.args = args
        self.retval = retval
        self.state = state

    def get_args(self):
        return self.args

    def get_retval(self):
        return self.retval

    def get_score(self):
        return jnp.asarray(0.0)

    def get_gen_fn(self):
        return self.gen_fn

    def get_choices(self):
        return ChoiceMap()

    def project(self, selection):
        return jnp.asarray(0.0)


def _cdt_flatten(t):
    from ..utils import split_static
    args_dyn, args_aux = split_static(t.args)
    return (args_dyn, t.retval, t.state), (t.gen_fn, args_aux)


def _cdt_unflatten(aux, c):
    from ..utils import join_static
    return CustomDetermGFTrace(aux[0], join_static(c[0], aux[1]), c[1], c[2])


jax.tree_util.register_pytree_node(
    CustomDetermGFTrace, _cdt_flatten, _cdt_unflatten)


class CustomDetermGF(GenerativeFunction):
    """Subclass and implement apply_with_state / update_with_state /
    gradient_with_state (reference custom_determ.jl:10-63)."""

    def apply_with_state(self, args: Tuple):
        """-> (retval, state)."""
        raise NotImplementedError

    def update_with_state(self, state, args: Tuple, argdiffs: Tuple):
        """-> (new_state, retval, retdiff)."""
        retval, new_state = self.apply_with_state(args)
        return new_state, retval, UnknownChange

    def gradient_with_state(self, state, args: Tuple, retgrad):
        """-> arg_grads (None per non-differentiable arg)."""
        return tuple(None for _ in args)

    def accepts_output_grad(self) -> bool:
        return True

    # -- GFI --------------------------------------------------------------

    def simulate(self, key, args: Tuple):
        retval, state = self.apply_with_state(args)
        return CustomDetermGFTrace(self, args, retval, state)

    def generate(self, key, args: Tuple, constraints: ChoiceMap = None):
        if constraints is not None and not constraints.is_empty():
            raise ValueError(
                "deterministic generative function accepts no constraints")
        return self.simulate(key, args), jnp.asarray(0.0)

    def assess(self, args: Tuple, choices: ChoiceMap):
        retval, _ = self.apply_with_state(args)
        return jnp.asarray(0.0), retval

    def project(self, trace, selection: Selection):
        return jnp.asarray(0.0)

    def propose(self, key, args: Tuple):
        tr = self.simulate(key, args)
        return ChoiceMap(), jnp.asarray(0.0), tr.get_retval()

    def update(self, key, trace, args: Tuple, argdiffs: Tuple,
               constraints: ChoiceMap):
        if constraints is not None and not constraints.is_empty():
            raise ValueError(
                "deterministic generative function accepts no constraints")
        state, retval, retdiff = self.update_with_state(trace.state, args,
                                                        argdiffs)
        return (CustomDetermGFTrace(self, args, retval, state),
                jnp.asarray(0.0), retdiff, ChoiceMap())

    def regenerate(self, key, trace, args: Tuple, argdiffs: Tuple,
                   selection: Selection):
        state, retval, retdiff = self.update_with_state(trace.state, args,
                                                        argdiffs)
        return (CustomDetermGFTrace(self, args, retval, state),
                jnp.asarray(0.0), retdiff)

    def choice_gradients(self, trace, selection=None, retgrad=None):
        arg_grads = self.gradient_with_state(trace.state, trace.get_args(),
                                             retgrad)
        return arg_grads, ChoiceMap(), ChoiceMap()

    def param_gradients(self, trace, retgrad=None, scale_factor=1.0):
        arg_grads = self.gradient_with_state(trace.state, trace.get_args(),
                                             retgrad)
        return arg_grads, {}


class CustomUpdateGF(CustomDetermGF):
    """Wrap ``apply_fn(*args)`` with a custom incremental
    ``update_fn(state, args, argdiffs) -> (state, retval, retdiff)``
    (reference custom_determ.jl:66-120)."""

    def __init__(self, apply_fn, update_fn=None):
        self.apply_fn = apply_fn
        self.update_fn = update_fn

    def apply_with_state(self, args):
        retval = self.apply_fn(*args)
        return retval, retval

    def update_with_state(self, state, args, argdiffs):
        if self.update_fn is None:
            return super().update_with_state(state, args, argdiffs)
        return self.update_fn(state, args, argdiffs)


class CustomGradientGF(CustomDetermGF):
    """Wrap a plain differentiable function: gradients via jax.grad
    (the reference requires a hand-written ``gradient`` method,
    custom_determ.jl:123-180; XLA autodiff supplies it here)."""

    def __init__(self, fn):
        self.fn = fn

    def apply_with_state(self, args):
        retval = self.fn(*args)
        return retval, None

    def gradient_with_state(self, state, args, retgrad):
        from ..utils import combine, partition_inexact, tree_vdot
        args_dyn, args_static = partition_inexact(args)

        def f(adyn):
            out = self.fn(*combine(adyn, args_static))
            return tree_vdot(retgrad, out) if retgrad is not None \
                else jnp.sum(jnp.asarray(out))

        return jax.grad(f)(args_dyn)
