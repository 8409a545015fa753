"""Masked values: dynamically-present constraints.

Not in the reference (whose constraint structure is always host-concrete);
required TPU-side whenever constraint *presence* varies per element of a
vmapped/scanned axis — e.g. particles with missing observations at some
timesteps, or per-element partial constraints in Map. A
:class:`MaskedValue` wraps ``(value, flag)``: structurally the address is
always constrained (static trace shape), but with ``flag=False`` the
handler samples instead and the weight contribution is zeroed — exactly
``generate``/``update`` semantics marginalized over the flag.

Usage::

    c = ChoiceMap().set_value("y", MaskedValue(obs, present))
    trace, w = model.generate(key, args, c)   # w includes logpdf(obs) only
                                              # where present is True
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class MaskedValue:
    """A constraint value with a (possibly traced) presence flag."""

    __slots__ = ("value", "flag")

    def __init__(self, value, flag):
        self.value = value
        self.flag = flag

    def __repr__(self):
        return f"MaskedValue({self.value!r}, flag={self.flag!r})"


jax.tree_util.register_pytree_node(
    MaskedValue,
    lambda m: ((m.value, m.flag), None),
    lambda _, c: MaskedValue(c[0], c[1]))


def mask(value, flag) -> MaskedValue:
    return MaskedValue(value, jnp.asarray(flag))


def is_masked(x) -> bool:
    return isinstance(x, MaskedValue)
