"""Switch combinator: branch selection by the first argument.

Reference: /root/reference/src/modeling_library/switch/ + cond.jl (420 LoC).
Args are ``(index, *branch_args)``; the selected branch's choices live
directly in the trace (no extra address level), and an index *change* under
``update`` inherits shared addresses from the previous branch
(update_recurse_merge, switch/update.jl:13-60) with
weight = generate_weight − prev_score (switch/update.jl:86-107).

TPU-native design — two execution modes:

* **concrete index** (Python int): dispatch to one branch; trace wraps that
  branch's trace. Full reference semantics including index-change update/
  regenerate and discards.
* **traced index** (jit/vmap — e.g. per-particle mixture components): run
  ALL branches and select score/retval/weight by index (`lax.switch`-style
  select). Branch count is small and static, so this is the XLA-friendly
  formulation: no data-dependent control flow, vmap just works. Choice-map
  views require a concrete index.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..choice_map import ChoiceMap
from ..diff import UnknownChange, all_unknown_change
from ..gfi import GenerativeFunction, Trace
from ..selection import Selection


def _is_concrete_index(index) -> bool:
    if isinstance(index, (int, np.integer)):
        return True
    if isinstance(index, jnp.ndarray) and not isinstance(
            index, jax.core.Tracer):
        return index.ndim == 0
    return False


class SwitchTrace(Trace):
    """Concrete-index mode: wraps the active branch's trace."""

    __slots__ = ("gen_fn", "index", "branch_trace", "args")

    def __init__(self, gen_fn, index, branch_trace, args):
        self.gen_fn = gen_fn
        self.index = index
        self.branch_trace = branch_trace
        self.args = args

    def get_args(self):
        return self.args

    def get_retval(self):
        return self.branch_trace.get_retval()

    def get_score(self):
        return self.branch_trace.get_score()

    def get_gen_fn(self):
        return self.gen_fn

    def get_choices(self):
        return self.branch_trace.get_choices()

    def project(self, selection: Selection):
        return self.branch_trace.project(selection)

    def __getitem__(self, addr):
        return self.branch_trace[addr]


jax.tree_util.register_pytree_node(
    SwitchTrace,
    lambda t: ((t.branch_trace, t.args), (t.gen_fn, t.index)),
    lambda aux, c: SwitchTrace(aux[0], aux[1], c[0], c[1]))


class AllBranchesSwitchTrace(Trace):
    """Traced-index mode: holds every branch's trace plus the index."""

    __slots__ = ("gen_fn", "index", "branch_traces", "args")

    def __init__(self, gen_fn, index, branch_traces, args):
        self.gen_fn = gen_fn
        self.index = index
        self.branch_traces = branch_traces
        self.args = args

    def get_args(self):
        return self.args

    def get_retval(self):
        vals = [t.get_retval() for t in self.branch_traces]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.select(
                [self.index == i for i in range(len(xs))], list(xs)), *vals)

    def get_score(self):
        scores = jnp.stack([t.get_score() for t in self.branch_traces])
        return scores[self.index]

    def get_gen_fn(self):
        return self.gen_fn

    def get_choices(self):
        if _is_concrete_index(self.index):
            return self.branch_traces[int(self.index)].get_choices()
        raise ValueError(
            "Switch with a traced index has no single choice-map view; "
            "use GFI operations, or a concrete index")

    def project(self, selection: Selection):
        ps = jnp.stack([t.project(selection) for t in self.branch_traces])
        return ps[self.index]


jax.tree_util.register_pytree_node(
    AllBranchesSwitchTrace,
    lambda t: ((t.index, tuple(t.branch_traces), t.args), (t.gen_fn,)),
    lambda aux, c: AllBranchesSwitchTrace(aux[0], c[0], list(c[1]), c[2]))


class SwitchCombinator(GenerativeFunction):
    """``Switch(b0, b1, ...)``: args = (index, *shared_branch_args)."""

    def __init__(self, *branches: GenerativeFunction):
        if len(branches) == 1 and isinstance(branches[0], (list, tuple)):
            branches = tuple(branches[0])
        self.branches = tuple(branches)

    def __repr__(self):
        return f"Switch({self.branches!r})"

    def accepts_output_grad(self) -> bool:
        return True

    def has_argument_grads(self):
        return None

    # -- GFI --------------------------------------------------------------

    def simulate(self, key, args: Tuple):
        index, bargs = args[0], tuple(args[1:])
        if _is_concrete_index(index):
            sub = self.branches[int(index)].simulate(key, bargs)
            return SwitchTrace(self, int(index), sub, args)
        keys = jax.random.split(key, len(self.branches))
        subs = [b.simulate(k, bargs) for b, k in zip(self.branches, keys)]
        return AllBranchesSwitchTrace(self, index, subs, args)

    def generate(self, key, args: Tuple, constraints: ChoiceMap = None):
        index, bargs = args[0], tuple(args[1:])
        constraints = constraints if constraints is not None else ChoiceMap()
        if _is_concrete_index(index):
            sub, w = self.branches[int(index)].generate(key, bargs,
                                                        constraints)
            return SwitchTrace(self, int(index), sub, args), w
        keys = jax.random.split(key, len(self.branches))
        pairs = [b.generate(k, bargs, constraints)
                 for b, k in zip(self.branches, keys)]
        subs = [p[0] for p in pairs]
        ws = jnp.stack([p[1] for p in pairs])
        return AllBranchesSwitchTrace(self, index, subs, args), ws[index]

    def assess(self, args: Tuple, choices: ChoiceMap):
        index, bargs = args[0], tuple(args[1:])
        if _is_concrete_index(index):
            return self.branches[int(index)].assess(bargs, choices)
        outs = [b.assess(bargs, choices) for b in self.branches]
        ws = jnp.stack([o[0] for o in outs])
        retval = jax.tree_util.tree_map(
            lambda *xs: jnp.select([index == i for i in range(len(xs))],
                                   list(xs)), *[o[1] for o in outs])
        return ws[index], retval

    def project(self, trace, selection: Selection):
        return trace.project(selection)

    def update(self, key, trace, args: Tuple, argdiffs: Tuple,
               constraints: ChoiceMap):
        index, bargs = args[0], tuple(args[1:])
        bdiffs = tuple(argdiffs[1:]) if len(argdiffs) > 1 else \
            all_unknown_change(bargs)
        constraints = constraints if constraints is not None else ChoiceMap()

        if isinstance(trace, SwitchTrace) and _is_concrete_index(index):
            if int(index) == trace.index:
                sub, w, rd, disc = self.branches[int(index)].update(
                    key, trace.branch_trace, bargs, bdiffs, constraints)
                return SwitchTrace(self, int(index), sub, args), w, rd, disc
            # index change: inherit shared addresses from the old branch
            # (reference update_recurse_merge + weight = gen_w - prev_score)
            prev_choices = trace.get_choices()
            merged = prev_choices.merge(constraints, overwrite=True)
            sub, gen_w = self.branches[int(index)].generate(key, bargs,
                                                            merged)
            weight = gen_w - trace.get_score()
            discard = _switch_discard(prev_choices, constraints,
                                      sub.get_choices())
            return (SwitchTrace(self, int(index), sub, args), weight,
                    UnknownChange, discard)

        # traced-index mode: update every branch, select weight by index
        if isinstance(trace, AllBranchesSwitchTrace):
            keys = jax.random.split(key, len(self.branches)) \
                if key is not None else [None] * len(self.branches)
            outs = [b.update(k, t, bargs, bdiffs, constraints)
                    for b, t, k in zip(self.branches, trace.branch_traces,
                                       keys)]
            subs = [o[0] for o in outs]
            ws = jnp.stack([o[1] for o in outs])
            same = index == trace.index if not _is_concrete_index(index) \
                else jnp.asarray(index == trace.index)
            # index changes with traced indexes: weight = new_score - prev
            new_scores = jnp.stack([s.get_score() for s in subs])
            changed_w = new_scores[index] - trace.get_score()
            weight = jnp.where(same, ws[index], changed_w)
            return (AllBranchesSwitchTrace(self, index, subs, args), weight,
                    UnknownChange, ChoiceMap())
        raise TypeError(f"unexpected trace type {type(trace).__name__}")

    def regenerate(self, key, trace, args: Tuple, argdiffs: Tuple,
                   selection: Selection):
        index, bargs = args[0], tuple(args[1:])
        bdiffs = tuple(argdiffs[1:]) if len(argdiffs) > 1 else \
            all_unknown_change(bargs)

        if isinstance(trace, SwitchTrace) and _is_concrete_index(index):
            if int(index) == trace.index:
                sub, w, rd = self.branches[int(index)].regenerate(
                    key, trace.branch_trace, bargs, bdiffs, selection)
                return SwitchTrace(self, int(index), sub, args), w, rd
            # index change (reference switch/regenerate.jl:12-33):
            # constrain the new branch with the retained (unselected) choices
            retained = trace.get_choices().filter(selection.complement())
            sub, gen_w = self.branches[int(index)].generate(key, bargs,
                                                            retained)
            weight = (gen_w - trace.project(selection.complement())
                      + sub.project(selection) - trace.project(selection))
            return (SwitchTrace(self, int(index), sub, args), weight,
                    UnknownChange)

        if isinstance(trace, AllBranchesSwitchTrace):
            keys = jax.random.split(key, len(self.branches))
            outs = [b.regenerate(k, t, bargs, bdiffs, selection)
                    for b, t, k in zip(self.branches, trace.branch_traces,
                                       keys)]
            subs = [o[0] for o in outs]
            ws = jnp.stack([o[1] for o in outs])
            return (AllBranchesSwitchTrace(self, index, subs, args),
                    ws[index], UnknownChange)
        raise TypeError(f"unexpected trace type {type(trace).__name__}")


def _switch_discard(prev_choices: ChoiceMap, constraints: ChoiceMap,
                    new_choices: ChoiceMap) -> ChoiceMap:
    """Choices of the previous branch that were overwritten by constraints
    or do not appear in the new branch (reference switch/update.jl:59-79)."""
    discard = ChoiceMap()
    for path, value in prev_choices.leaf_items():
        if constraints.has_value(path) or not new_choices.has_value(path):
            discard.set_value(path, value)
    return discard


def Switch(*branches) -> SwitchCombinator:
    return SwitchCombinator(*branches)
