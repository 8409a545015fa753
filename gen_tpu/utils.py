"""Small pytree utilities shared across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_inexact(x) -> bool:
    try:
        return jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
    except (TypeError, ValueError):
        return False


def partition_inexact(tree):
    """Split a pytree into (differentiable, static) halves.

    Differentiable = leaves with inexact (float/complex) dtype; everything
    else (ints, bools, non-arrays) goes to the static half. ``None`` fills
    the holes (None is an empty pytree node, so ``jax.grad`` w.r.t. the
    differentiable half just works)."""
    dyn = jax.tree_util.tree_map(lambda x: x if is_inexact(x) else None, tree)
    static = jax.tree_util.tree_map(lambda x: None if is_inexact(x) else x, tree)
    return dyn, static


def combine(dyn, static):
    """Inverse of :func:`partition_inexact`."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a, dyn, static,
        is_leaf=lambda x: x is None)


def tree_vdot(a, b):
    """Sum of elementwise products over matching leaves; ``a`` may be None
    (→ 0). Used for the <retgrad, retval> term of gradient methods."""
    if a is None:
        return jnp.asarray(0.0)
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    total = jnp.asarray(0.0)
    for x, y in zip(leaves_a, leaves_b):
        total = total + jnp.sum(jnp.asarray(x) * jnp.asarray(y))
    return total


def is_static_scalar(x) -> bool:
    """Shape-determining scalars stay static across jit/vmap/scan boundaries
    (JAX convention): plain Python/numpy ints, bools, strings, None. Arrays
    and floats are traced."""
    import numpy as _np
    if x is None or isinstance(x, str):
        return True
    if isinstance(x, jnp.ndarray):
        return False
    return isinstance(x, (bool, int, _np.bool_, _np.integer))


def split_static(tree):
    """Partition a pytree's leaves into traced children and hashable static
    aux, for trace pytree registrations. Returns (dyn_children, aux)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    mask = tuple(is_static_scalar(x) for x in flat)
    dyn = tuple(x for x, s in zip(flat, mask) if not s)
    static = tuple(x for x, s in zip(flat, mask) if s)
    return dyn, (treedef, mask, static)


def join_static(dyn, aux):
    treedef, mask, static = aux
    dyn_iter = iter(dyn)
    static_iter = iter(static)
    flat = [next(static_iter) if s else next(dyn_iter) for s in mask]
    return jax.tree_util.tree_unflatten(treedef, flat)


def logsumexp(x, axis=None):
    """Numerically stable logsumexp (reference:
    /root/reference/src/inference/inference.jl:3-7)."""
    return jax.scipy.special.logsumexp(jnp.asarray(x), axis=axis)


def sqrt_mass_safe(inv_mass):
    """Momentum scale with frozen-coordinate support: inv_mass == 0 means
    infinite mass (the coordinate is frozen for Gibbs-within-HMC/NUTS
    blocks or per-chain conditioning); its momentum draw is zero and every
    other momentum use is inv_mass-weighted, so it never moves. Works on
    arrays and (SMEM) scalars — the ONE definition every engine and
    kernel shares (divergence here would silently change which
    coordinates count as frozen)."""
    import jax.numpy as jnp
    return jnp.where(inv_mass > 0,
                     1.0 / jnp.sqrt(jnp.maximum(inv_mass, 1e-30)), 0.0)


def bf16_round(x):
    """Round f32 to the nearest bf16 value (round-to-nearest-even),
    returned as f32 — implemented with the EXACT bit arithmetic the fused
    kernels' checkpoint packing uses (:func:`bf16_pack2`), so an XLA
    reference that rounds with this function matches the kernel bit for
    bit. (Matches ``x.astype(bfloat16).astype(float32)`` for all finite
    values; an all-ones-mantissa NaN can carry into the sign bit — the
    same benign artifact in both implementations, only reachable on
    already-diverged trajectories.)"""
    import jax
    u = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                     jnp.uint32)
    r = (u + 0x7FFF + ((u >> 16) & 1)) & np.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def bf16_pack2(a, b):
    """Pack two f32 arrays as bf16x2 into one int32 array (a in the high
    half, b in the low half), halving the VMEM cost of values that only
    feed low-precision consumers (the fused NUTS kernels' U-turn
    checkpoints). Round-trip = :func:`bf16_round` exactly."""
    import jax
    ua = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32),
                                      jnp.uint32)
    ub = jax.lax.bitcast_convert_type(jnp.asarray(b, jnp.float32),
                                      jnp.uint32)
    hi = (ua + 0x7FFF + ((ua >> 16) & 1)) & np.uint32(0xFFFF0000)
    lo = ((ub + 0x7FFF + ((ub >> 16) & 1)) & np.uint32(0xFFFF0000)) >> 16
    return jax.lax.bitcast_convert_type(hi | lo, jnp.int32)


def bf16_unpack2(p):
    """Inverse of :func:`bf16_pack2`: int32 -> (a, b) f32 arrays."""
    import jax
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return a, b
