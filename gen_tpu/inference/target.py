"""Flat-vector view of a trace's selected choices.

Gradient-based kernels (HMC/NUTS/MALA/MAP) act on the ``to_array``-flattened
selected continuous choices (reference: src/inference/hmc.jl:31-41). The
reference re-runs ``update`` + ``choice_gradients`` on the whole trace at
every leapfrog step; here we extract a closed-over potential
``logp: R^d -> R`` once (assess on the merged choice map) and let XLA fuse
its value-and-grad into the integrator loop — the trace is only rebuilt
once, at accept time. Identical math, far less interpreter work."""

from __future__ import annotations

import jax

from ..diff import all_no_change
from ..gfi import Trace
from ..selection import Selection


class FlatTarget:
    """(logp(flat), grad) over the selected choices of a trace."""

    def __init__(self, trace: Trace, selection: Selection):
        gen_fn = trace.get_gen_fn()
        args = trace.get_args()
        choices = trace.get_choices()
        self.values_chm = choices.filter(selection)
        if len(self.values_chm) == 0:
            raise ValueError("selection matches no choices")
        rest = choices.filter(selection.complement())
        self.flat0 = self.values_chm.to_array()
        self.dim = self.flat0.shape[0]
        self._trace = trace
        self._gen_fn = gen_fn
        self._args = args
        self._argdiffs = all_no_change(args)

        def logp(flat):
            chm = self.values_chm.from_array(flat)
            w, _ = gen_fn.assess(args, rest.merge(chm))
            return w

        self.logp = logp
        self.value_and_grad = jax.value_and_grad(logp)

    def rebuild(self, flat):
        """New trace with the selected choices set to ``flat`` (single
        ``update``; key-free since fully constrained)."""
        new_trace, _, _, _ = self._gen_fn.update(
            None, self._trace, self._args, self._argdiffs,
            self.values_chm.from_array(flat))
        return new_trace
