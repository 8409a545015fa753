"""DynamicTrace: the trace of a traced-interpreter generative function.

Analogue of Gen.jl's ``DynamicDSLTrace`` (/root/reference/src/dynamic/
trace.jl:30-166), redesigned as a JAX pytree: the record *structure* (which
addresses exist, and whether each is a choice or a call) is static treedef
metadata; values, scores, and subtraces are traced leaves. A jitted GFI
method therefore compiles once per (model, constraint-structure) pair and
the whole trace lives on device as a handful of fused arrays.

Records are stored flat, keyed by normalized address *paths* (tuples); the
hierarchical choice-map view is materialized on demand.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..address import Address, addr_path, key_sort_key
from ..choice_map import ChoiceMap
from ..gfi import Trace
from ..selection import NONE, Selection


class ChoiceRecord:
    """A primitive random choice: (value, score). Reference: the
    ``ChoiceOrCallRecord`` leaf with ``is_choice=true`` (dynamic/trace.jl)."""

    __slots__ = ("value", "score")

    def __init__(self, value, score):
        self.value = value
        self.score = score


class CallRecord:
    """A generative-function call: the full subtrace plus cached noise
    (= project(subtrace, EmptySelection), reference dynamic/trace.jl:76-88)."""

    __slots__ = ("subtrace", "noise")

    def __init__(self, subtrace: Trace, noise):
        self.subtrace = subtrace
        self.noise = noise

    @property
    def score(self):
        return self.subtrace.get_score()


def _record_flatten(r):
    if isinstance(r, ChoiceRecord):
        return (r.value, r.score), ChoiceRecord
    return (r.subtrace, r.noise), CallRecord


def _record_unflatten(kind, children):
    if kind is ChoiceRecord:
        return ChoiceRecord(*children)
    return CallRecord(*children)


for _cls in (ChoiceRecord, CallRecord):
    jax.tree_util.register_pytree_node(
        _cls, _record_flatten, _record_unflatten)


def _path_sort_key(path: Tuple) -> Tuple:
    return tuple(key_sort_key(k) for k in path)


class DynamicTrace(Trace):
    """See module docstring."""

    __slots__ = ("gen_fn", "args", "retval", "score", "noise", "records")

    def __init__(self, gen_fn, args, retval, score, noise,
                 records: Dict[Tuple, Any]):
        self.gen_fn = gen_fn
        self.args = args
        self.retval = retval
        self.score = score
        self.noise = noise
        self.records = records  # path tuple -> ChoiceRecord | CallRecord

    # -- GFI accessors ----------------------------------------------------

    def get_args(self):
        return self.args

    def get_retval(self):
        return self.retval

    def get_score(self):
        return self.score

    def get_gen_fn(self):
        return self.gen_fn

    def get_choices(self) -> ChoiceMap:
        out = ChoiceMap()
        for path, rec in self.records.items():
            if isinstance(rec, ChoiceRecord):
                out.set_value(path, rec.value)
            else:
                sub = rec.subtrace.get_choices()
                if not sub.is_empty():
                    out.set_submap(path, sub)
        return out

    def __getitem__(self, addr: Address):
        """Choice value, or a call's *return value* when the address names a
        call (Gen's ``trace[addr]`` auxiliary-state access)."""
        path = addr_path(addr)
        rec = self.records.get(path)
        if isinstance(rec, ChoiceRecord):
            return rec.value
        if isinstance(rec, CallRecord):
            return rec.subtrace.get_retval()
        # descend into a call whose path is a prefix
        for p, r in self.records.items():
            if isinstance(r, CallRecord) and path[:len(p)] == p and len(path) > len(p):
                rest = path[len(p):]
                return r.subtrace[rest if len(rest) > 1 else rest[0]]
        raise KeyError(f"no record at address {addr!r}")

    # -- record lookup (used by handlers) ---------------------------------

    def has_choice(self, path: Tuple) -> bool:
        return isinstance(self.records.get(path), ChoiceRecord)

    def get_choice(self, path: Tuple) -> ChoiceRecord:
        rec = self.records.get(path)
        if not isinstance(rec, ChoiceRecord):
            raise KeyError(f"no choice at {path!r}")
        return rec

    def has_call(self, path: Tuple) -> bool:
        return isinstance(self.records.get(path), CallRecord)

    def get_call(self, path: Tuple) -> CallRecord:
        rec = self.records.get(path)
        if not isinstance(rec, CallRecord):
            raise KeyError(f"no call at {path!r}")
        return rec

    # -- project ----------------------------------------------------------

    def project(self, selection: Selection):
        """Sum of selected choice scores plus recursive projects of calls.
        ``project(trace, EmptySelection()) == noise``.
        Reference: /root/reference/src/dynamic/project.jl:1-25."""
        if selection is NONE or (hasattr(selection, "is_empty_set")
                                 and selection.is_empty_set()):
            return self.noise
        from ..masked import MaskedSelection
        masked = isinstance(selection, MaskedSelection)
        total = jnp.asarray(0.0)
        for path, rec in self.records.items():
            if isinstance(rec, ChoiceRecord):
                if masked:
                    # traced membership: flag-weighted score (one compiled
                    # program serves every membership pattern)
                    total = total + jnp.where(selection.flag_at(path),
                                              rec.score, 0.0)
                elif path in selection:
                    total = total + rec.score
            else:
                subsel = selection
                for k in path:
                    subsel = subsel.subselection(k)
                total = total + rec.subtrace.project(subsel)
        return total

    def __repr__(self):
        return (f"DynamicTrace({self.gen_fn!r}, score={self.score!r}, "
                f"addresses={list(self.records)})")


def _trace_flatten(tr: DynamicTrace):
    from ..utils import split_static
    paths = sorted(tr.records.keys(), key=_path_sort_key)
    args_dyn, args_aux = split_static(tr.args)
    children = (args_dyn, tr.retval, tr.score, tr.noise,
                tuple(tr.records[p] for p in paths))
    return children, (tr.gen_fn, tuple(paths), args_aux)


def _trace_unflatten(aux, children):
    from ..utils import join_static
    gen_fn, paths, args_aux = aux
    args_dyn, retval, score, noise, recs = children
    return DynamicTrace(gen_fn, join_static(args_dyn, args_aux), retval,
                        score, noise, dict(zip(paths, recs)))


jax.tree_util.register_pytree_node(
    DynamicTrace, _trace_flatten, _trace_unflatten)
