"""Hierarchical addresses.

An *address* names a random choice or a generative-function call site inside a
trace. Addresses are either a single key (``str`` or ``int``) or a tuple of
keys forming a path into the hierarchy, e.g. ``("outer", "inner")`` or
``(3, "x")``.

Reference semantics: Gen.jl addresses built with ``=>`` pairs
(/root/reference/src/address.jl). Here we use plain Python tuples, which are
static under ``jax.jit`` (they live in the pytree treedef, not in traced
values).
"""

from __future__ import annotations

from typing import Iterable, Tuple, Union

Key = Union[str, int]
Address = Union[Key, Tuple[Key, ...]]


def addr_path(addr: Address) -> Tuple[Key, ...]:
    """Normalize an address to a tuple path."""
    if isinstance(addr, tuple):
        return addr
    return (addr,)


def addr_head_rest(addr: Address) -> Tuple[Key, Address]:
    """Split an address into its first key and the remaining path.

    The remaining path is ``()`` when the address is a single key.
    """
    path = addr_path(addr)
    if len(path) == 0:
        raise ValueError("empty address")
    head = path[0]
    rest = path[1:]
    if len(rest) == 1:
        return head, rest[0]
    return head, rest


def key_sort_key(k: Key):
    """A total order over mixed str/int keys, for deterministic flattening.

    Integers sort before strings; bools are treated as ints. This order fixes
    the layout of :func:`gen_tpu.choice_map.to_array` (cf. reference
    ``to_array`` at /root/reference/src/choice_map.jl:163-186, which relies on
    Julia's sorted-key iteration).
    """
    if isinstance(k, bool):
        return (0, int(k), "")
    if isinstance(k, int):
        return (0, k, "")
    return (1, 0, str(k))


def sorted_keys(keys: Iterable[Key]):
    return sorted(keys, key=key_sort_key)
