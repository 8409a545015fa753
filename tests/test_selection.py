"""Selection algebra tests (reference: test/selection.jl)."""

import gen_tpu as gt
from gen_tpu import select, selectall, selectnone, complement


def test_all_none():
    assert "x" in gt.ALL
    assert ("a", "b") in gt.ALL
    assert "x" not in gt.NONE
    assert gt.ALL.subselection("k") is gt.ALL
    assert gt.NONE.subselection("k") is gt.NONE
    assert gt.NONE.is_empty_set()


def test_select():
    s = select("x", ("a", "b"))
    assert "x" in s
    assert ("x",) in s
    assert ("a", "b") in s
    assert "a" not in s          # 'a' subtree not fully selected
    assert ("a", "c") not in s
    assert "y" not in s
    # whole-subtree semantics: selecting "x" selects everything under it
    assert ("x", "deep", "er") in s
    sub = s.subselection("a")
    assert "b" in sub and "c" not in sub


def test_complement():
    s = complement(select("x"))
    assert "x" not in s
    assert "y" in s
    assert ("x", "u") not in s
    assert complement(s) is not None
    # double complement returns the original
    assert "x" in complement(s)


def test_set_subselection():
    s = gt.HierarchicalSelection()
    s.set_subselection("a", select("b"))
    assert ("a", "b") in s
    assert ("a", "c") not in s
