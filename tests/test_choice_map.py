"""Choice map algebra tests (reference: test/assignment.jl, 375 LoC)."""

import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import ChoiceMap, choicemap, select


def test_basic_get_set():
    c = choicemap(x=1.0, y=2.0)
    assert c["x"] == 1.0
    assert c.has_value("x")
    assert not c.has_value("z")
    assert ("x",) in [tuple(a) for a in c.addresses()]
    with pytest.raises(KeyError):
        c.get_value("z")


def test_hierarchical():
    c = ChoiceMap()
    c.set_value(("a", "b"), 1.0)
    c.set_value(("a", "c"), 2.0)
    c.set_value("d", 3.0)
    assert c[("a", "b")] == 1.0
    sub = c.get_submap("a")
    assert sub["b"] == 1.0 and sub["c"] == 2.0
    assert list(c.addresses()) == [("d",), ("a", "b"), ("a", "c")]


def test_value_submap_conflict():
    c = choicemap(x=1.0)
    with pytest.raises(ValueError):
        c.set_value(("x", "y"), 2.0)
    c2 = ChoiceMap()
    c2.set_value(("x", "y"), 2.0)
    with pytest.raises(ValueError):
        c2.set_value("x", 1.0)


def test_merge():
    a = choicemap(x=1.0)
    a.set_value(("s", "u"), 2.0)
    b = choicemap(y=3.0)
    b.set_value(("s", "v"), 4.0)
    m = a.merge(b)
    assert m["x"] == 1.0 and m["y"] == 3.0
    assert m[("s", "u")] == 2.0 and m[("s", "v")] == 4.0
    # duplicate leaf errors (reference merge semantics)
    with pytest.raises(ValueError):
        a.merge(choicemap(x=9.0))
    # overwrite=True: other wins (the t+u of the update formula)
    m2 = a.merge(choicemap(x=9.0), overwrite=True)
    assert m2["x"] == 9.0


def test_equality_and_allclose():
    a = choicemap(x=1.0, y=2.0)
    b = choicemap(y=2.0, x=1.0)
    assert a == b
    c = choicemap(x=1.0 + 1e-9, y=2.0)
    assert a != c
    assert a.allclose(c)
    assert not a.allclose(choicemap(x=1.5, y=2.0))
    assert a != choicemap(x=1.0)


def test_to_from_array_roundtrip():
    c = ChoiceMap()
    c.set_value("b", jnp.array([1.0, 2.0]))
    c.set_value("a", 3.0)
    c.set_value(("s", "t"), jnp.array([[4.0, 5.0], [6.0, 7.0]]))
    arr = c.to_array()
    assert arr.shape == (7,)
    # deterministic sorted order: a, b, then s/t
    np.testing.assert_allclose(np.asarray(arr), [3, 1, 2, 4, 5, 6, 7])
    c2 = c.from_array(arr * 2)
    np.testing.assert_allclose(np.asarray(c2["a"]), 6.0)
    np.testing.assert_allclose(np.asarray(c2[("s", "t")]),
                               [[8.0, 10.0], [12.0, 14.0]])
    with pytest.raises(ValueError):
        c.from_array(jnp.zeros(5))


def test_int_keys_sorted_before_str():
    c = ChoiceMap()
    c.set_value("z", 1.0)
    c.set_value(2, 2.0)
    c.set_value(1, 3.0)
    assert list(c.addresses()) == [(1,), (2,), ("z",)]


def test_filter_by_selection():
    c = ChoiceMap()
    c.set_value("x", 1.0)
    c.set_value("y", 2.0)
    c.set_value(("s", "u"), 3.0)
    f = c.filter(select("x", ("s", "u")))
    assert f.has_value("x") and not f.has_value("y")
    assert f[("s", "u")] == 3.0
    empty = c.filter(gt.NONE)
    assert empty.is_empty()
    full = c.filter(gt.ALL)
    assert full == c


def test_pytree_roundtrip():
    import jax
    c = ChoiceMap()
    c.set_value("x", jnp.array(1.0))
    c.set_value(("s", "u"), jnp.array([2.0, 3.0]))
    leaves, treedef = jax.tree_util.tree_flatten(c)
    c2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert c2 == c
    doubled = jax.tree_util.tree_map(lambda x: x * 2, c)
    assert doubled["x"] == 2.0


def test_from_dict_and_as_dict():
    c = choicemap({"x": 1.0, "sub": {"y": 2.0}})
    assert c["x"] == 1.0 and c[("sub", "y")] == 2.0
    d = c.as_dict()
    assert d["sub"]["y"] == 2.0
