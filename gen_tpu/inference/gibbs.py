"""Exact Gibbs moves over finite discrete addresses.

No reference analogue as a library function: Gen.jl's examples hand-roll
Gibbs sweeps by scoring each candidate with ``update`` in a Julia loop
(e.g. examples/regression/dynamic_map_optimize_gibbs.jl). Here that
pattern is a first-class, jit/vmap-able kernel: the candidate grid is
scored by ONE ``vmap`` of the key-free ``update`` (no sampling is needed
when every address in the block is constrained, so ``key=None`` threads
through), the new value is a single ``categorical`` draw, and the updated
trace is gathered from the candidate batch. Because ``update`` weights are
log p(new)/p(old) at fixed arguments, the normalized weights ARE the exact
full conditional — this move is a rejection-free, detailed-balance-exact
MCMC kernel (acceptance probability 1).

Cost: |grid| model re-scores, fused into one XLA program. For several
addresses resampled JOINTLY, pass a dict of supports (Cartesian product —
exact blocked Gibbs). For sweeps over many addresses, prefer a few blocked
moves over long per-address Python loops: each ``gibbs`` call inlines one
re-score program per call site (see CLAUDE.md's compile-explosion note);
conditionally-independent sites should be vectorized inside the model
(Map / batched addresses) as in examples/regression.py's indicator sweep.
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp

from ..address import addr_path
from ..choice_map import ChoiceMap
from ..gfi import Trace


def _candidate_grid(supports: Dict):
    """Cartesian product of per-address supports: dict path -> (G,) cols."""
    paths = [addr_path(a) for a in supports]
    arrs = [jnp.asarray(v) for v in supports.values()]
    mesh = jnp.meshgrid(*[jnp.arange(a.shape[0]) for a in arrs],
                        indexing="ij")
    return {p: a[m.reshape(-1)] for p, a, m in zip(paths, arrs, mesh)}


def gibbs(key, trace: Trace, addr_or_supports: Union[object, Dict],
          support=None) -> Trace:
    """Resample one address (``gibbs(key, trace, "z", support)``) or a
    block of addresses (``gibbs(key, trace, {"z1": s1, "z2": s2})``) from
    its EXACT conditional given all other choices.

    ``support`` arrays must cover the address's full support (candidate
    values, 1-D along the leading axis) and match the stored value's dtype/
    trailing shape. Returns the new trace; always accepted.
    """
    if support is not None:
        supports = {addr_or_supports: support}
    else:
        supports = dict(addr_or_supports)
        if not supports:
            raise ValueError("gibbs: empty support dict")
    grid = _candidate_grid(supports)

    def score(cand):
        cons = ChoiceMap()
        for p, v in cand.items():
            cons = cons.set_value(p, v)
        new_tr, w, _, _ = trace.update(None, cons)
        return new_tr, w

    traces, ws = jax.vmap(score)(grid)
    idx = jax.random.categorical(key, ws)
    return jax.tree_util.tree_map(lambda x: x[idx], traces)


def gibbs_conditional(trace: Trace, addr_or_supports: Union[object, Dict],
                      support=None):
    """The exact full-conditional log-probabilities the :func:`gibbs` move
    samples from (normalized, over the flattened candidate grid). Useful
    for Rao-Blackwellized estimators and for testing."""
    if support is not None:
        supports = {addr_or_supports: support}
    else:
        supports = dict(addr_or_supports)
    grid = _candidate_grid(supports)

    def score(cand):
        cons = ChoiceMap()
        for p, v in cand.items():
            cons = cons.set_value(p, v)
        _, w, _, _ = trace.update(None, cons)
        return w

    ws = jax.vmap(score)(grid)
    from ..utils import logsumexp
    return grid, ws - logsumexp(ws)
