"""Selections: sets of hierarchical addresses.

TPU-native analogue of Gen.jl's selection types
(/root/reference/src/address.jl:54-370). Selections are static metadata (they
never contain traced values) — under ``jit`` a selection is part of the cache
key, so each (model, selection) pair compiles once, mirroring Gen's
generated-code specialization on address schemas.
"""

from __future__ import annotations

from typing import Dict

from .address import Address, Key, addr_head_rest


class Selection:
    """Abstract set of hierarchical addresses."""

    def __contains__(self, addr: Address) -> bool:
        raise NotImplementedError

    def subselection(self, key: Key) -> "Selection":
        """The selection at a nested key (Gen's ``selection[key]``)."""
        raise NotImplementedError

    def __getitem__(self, key: Key) -> "Selection":
        return self.subselection(key)

    def is_empty_set(self) -> bool:
        return False

    def complement(self) -> "Selection":
        return ComplementSelection(self)


class AllSelection(Selection):
    """Selects every address (Gen: /root/reference/src/address.jl:84-96)."""

    def __contains__(self, addr: Address) -> bool:
        return True

    def subselection(self, key: Key) -> Selection:
        return self

    def complement(self) -> "Selection":
        return NONE

    def __repr__(self):
        return "AllSelection()"


class EmptySelection(Selection):
    """Selects nothing (Gen: /root/reference/src/address.jl:70-82)."""

    def __contains__(self, addr: Address) -> bool:
        return False

    def subselection(self, key: Key) -> Selection:
        return self

    def is_empty_set(self) -> bool:
        return True

    def complement(self) -> "Selection":
        return ALL

    def __repr__(self):
        return "EmptySelection()"


ALL = AllSelection()
NONE = EmptySelection()


class ComplementSelection(Selection):
    """Complement of another selection (Gen: address.jl:98-115)."""

    def __init__(self, inner: Selection):
        self.inner = inner

    def __contains__(self, addr: Address) -> bool:
        return addr not in self.inner

    def subselection(self, key: Key) -> Selection:
        return ComplementSelection(self.inner.subselection(key))

    def complement(self) -> Selection:
        return self.inner

    def __repr__(self):
        return f"complement({self.inner!r})"


class HierarchicalSelection(Selection):
    """A trie of subselections (Gen's ``DynamicSelection``,
    /root/reference/src/address.jl:259-340)."""

    def __init__(self, subs: Dict[Key, Selection] | None = None):
        self.subs: Dict[Key, Selection] = dict(subs) if subs else {}

    def __contains__(self, addr: Address) -> bool:
        head, rest = addr_head_rest(addr)
        sub = self.subs.get(head)
        if sub is None:
            return False
        if rest == ():
            # a key is "in" the selection if its whole subtree is selected
            return isinstance(sub, AllSelection)
        return rest in sub

    def subselection(self, key: Key) -> Selection:
        return self.subs.get(key, NONE)

    def set_subselection(self, addr: Address, sel: Selection) -> "HierarchicalSelection":
        head, rest = addr_head_rest(addr)
        if rest == ():
            self.subs[head] = sel
        else:
            sub = self.subs.get(head)
            if not isinstance(sub, HierarchicalSelection):
                sub = HierarchicalSelection()
                self.subs[head] = sub
            sub.set_subselection(rest, sel)
        return self

    def is_empty_set(self) -> bool:
        return all(s.is_empty_set() for s in self.subs.values())

    def __repr__(self):
        return f"select({sorted(map(str, self.subs))})"


def select(*addrs: Address) -> Selection:
    """Select the given addresses (and their whole subtrees), like Gen's
    ``select(addrs...)`` (/root/reference/src/address.jl:352-360)."""
    out = HierarchicalSelection()
    for a in addrs:
        out.set_subselection(a, ALL)
    return out


def selectall() -> Selection:
    return ALL


def selectnone() -> Selection:
    return NONE


def complement(sel: Selection) -> Selection:
    return sel.complement()
