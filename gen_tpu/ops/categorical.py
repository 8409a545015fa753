"""Fused batched categorical sampling as a Pallas TPU kernel.

The hot op of vectorized discrete Gibbs sweeps (examples/decode.py's cipher
sampler, HMM blocked Gibbs) and multinomial resampling: sample N independent
categoricals from an (N, K) logit matrix. XLA's formulation
(``jax.random.categorical``) materializes an (N, K) uniform draw, an (N, K)
gumbel add, and an argmax — three HBM round-trips of the full matrix. The
Pallas kernel fuses everything in VMEM: logits are read ONCE from HBM, the
gumbel noise comes from the on-core PRNG (``pltpu.prng_random_bits``, never
touching HBM), and only the (N,) argmax indices are written back.

Exactness: gumbel-argmax is an exact categorical sampler; the uniform is
built from 23 mantissa bits (same construction jax.random uses). The stream
differs from jax.random's (per-core PRNG seeded from the key + tile id), so
results are identical in DISTRIBUTION, not bitwise — tested by chi-square
against the true probabilities on TPU, and the XLA fallback is used off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TILE_N = 128  # best across the measured tile sweep (128/256/512/1024)
_LANE = 128
# Measured on v5e (tunneled; ~2x session-to-session variance): pallas wins
# 1.2-1.65x for K <= 128 (the PPL regime: Gibbs alphabets, HMM states,
# mixture components), parity-to-0.7x above — XLA already fuses the
# gumbel+argmax into one HBM pass, so the kernel's edge is only the on-core
# PRNG. Dispatch accordingly.
_MAX_PALLAS_K = 128


def _uniform_from_bits(bits):
    """uint32 bits -> float32 uniform in [0, 1) via the [1,2) mantissa trick
    (the same construction as jax._src.random._uniform)."""
    from jax.experimental.pallas import tpu as pltpu
    mant = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                       jnp.uint32(9))
    fbits = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32)
    return fbits - 1.0


def _kernel(k_actual, injected, *refs):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl
    if injected:
        # host-side PRNG substitute: uniforms are an input, which makes the
        # kernel exactly comparable to the XLA gumbel-argmax (and runnable
        # under the TPU interpreter on CPU — tests/test_ops_categorical.py)
        logits_ref, seed_ref, u_ref, out_ref = refs
        x = logits_ref[...].astype(jnp.float32)
        u = u_ref[...]
    else:
        logits_ref, seed_ref, out_ref = refs
        # per-tile stream: golden-ratio-mix the tile id into the second seed
        # word (the TPU PRNG accepts at most two seed values)
        pid = pl.program_id(0).astype(jnp.uint32)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (pid * jnp.uint32(0x9E3779B9)))
        x = logits_ref[...].astype(jnp.float32)
        u = _uniform_from_bits(pltpu.prng_random_bits(x.shape))
    # gumbel = -log(-log(u)); clamp away u=0 exactly like jax.random does
    tiny = jnp.float32(1.1754944e-38)
    g = -jnp.log(-jnp.log(jnp.maximum(u, tiny)))
    kpad = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(col < k_actual, x + g, jnp.float32(-jnp.inf))
    m = jnp.max(x, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(x == m, col, kpad), axis=1)
    out_ref[:, 0] = jnp.minimum(idx, k_actual - 1)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def batched_categorical(key, logits, use_pallas: bool = False,
                        injected_u=None, interpret: bool = False):
    """Sample ``out[i] ~ Categorical(softmax(logits[i]))``.

    logits: (N, K) unnormalized log-probabilities. Returns (N,) int32.
    On TPU (``use_pallas=True``) runs the fused VMEM kernel; otherwise the
    XLA gumbel-argmax (identical distribution). Testing hooks:
    ``injected_u`` (N, K) uniforms replace the on-core PRNG;
    ``interpret=True`` runs the kernel under the Pallas TPU interpreter.
    """
    logits = jnp.asarray(logits)
    n, k = logits.shape
    if interpret:
        use_pallas = True
    if not use_pallas:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_pad = max(_LANE, ((k + _LANE - 1) // _LANE) * _LANE)
    n_pad = ((n + _TILE_N - 1) // _TILE_N) * _TILE_N
    padded = jnp.full((n_pad, k_pad), -jnp.inf, dtype=jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, logits.astype(jnp.float32), (0, 0))
    seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2]
    in_specs = [pl.BlockSpec((_TILE_N, k_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [padded, seed]
    if injected_u is not None:
        u_pad = jnp.zeros((n_pad, k_pad), jnp.float32)
        u_pad = jax.lax.dynamic_update_slice(
            u_pad, jnp.asarray(injected_u, jnp.float32), (0, 0))
        in_specs.append(pl.BlockSpec((_TILE_N, k_pad), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(u_pad)
    out = pl.pallas_call(
        functools.partial(_kernel, k, injected_u is not None),
        grid=(n_pad // _TILE_N,),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*inputs)
    return out[:n, 0]


def categorical_fast(key, logits):
    """Auto-dispatching batched categorical: the fused Pallas kernel on TPU
    in its winning regime (K <= 128), XLA's gumbel-argmax otherwise."""
    from .resample import on_tpu
    logits = jnp.asarray(logits)
    use = on_tpu() and logits.ndim == 2 and logits.shape[1] <= _MAX_PALLAS_K
    return batched_categorical(key, logits, use_pallas=use)
