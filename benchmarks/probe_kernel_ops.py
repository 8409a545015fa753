"""Probe: do the kernel-v2 building blocks lower on real TPU Mosaic?

1. Leading-axis reduction: jnp.sum((d, 8, tc) plane, axis=0) inside a
   Pallas kernel (the de-unrolled dot_im).
2. bf16x2 packing: bitcast_convert_type f32<->uint32, shift/mask
   arithmetic, and an int32 packed plane carried through fori_loop
   (the checkpoint-compression trick).
3. Broadcast of an SMEM scalar into a plane + stacked loop-invariant
   inv_mass plane.

Run on the remote TPU: `python benchmarks/probe_kernel_ops.py`.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        out = [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]
        dt = time.time() - t0
        print(f"PASS {name}  ({dt:.1f}s)  out0={out[0].reshape(-1)[:3]}")
        return True
    except Exception as e:
        dt = time.time() - t0
        msg = str(e).split(chr(10))[0][:300]
        print(f"FAIL {name}  ({dt:.1f}s)  {type(e).__name__}: {msg}")
        return False


def main():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices())
    d, SUB, tc = 16, 8, 128

    # ---- 1. leading-axis reduction --------------------------------------
    def k_reduce(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sum(x * x, axis=0)

    def run_reduce():
        x = jnp.arange(d * SUB * tc, dtype=jnp.float32).reshape(d, SUB, tc)
        f = pl.pallas_call(
            k_reduce,
            out_shape=jax.ShapeDtypeStruct((SUB, tc), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        y = f(x)
        ref = np.sum(np.asarray(x) ** 2, axis=0)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5)
        return y

    probe("axis0_reduce", run_reduce)

    # ---- 2. bf16x2 pack/unpack + int32 fori carry -----------------------
    # weak Python int literals only: captured jax-array constants are
    # rejected by pallas_call
    M_HI = np.uint32(0xFFFF0000)

    def bf16_bits(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return (u + 0x7FFF + ((u >> 16) & 1)) & M_HI

    def pack(a, b):
        return jax.lax.bitcast_convert_type(
            bf16_bits(a) | (bf16_bits(b) >> 16), jnp.int32)

    def unpack(p):
        u = jax.lax.bitcast_convert_type(p, jnp.uint32)
        a = jax.lax.bitcast_convert_type(u & M_HI, jnp.float32)
        b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
        return a, b

    def k_pack(x_ref, o_ref):
        x = x_ref[...]
        p0 = pack(x[0], x[1])

        def body(i, p):
            a, b = unpack(p)
            return pack(a + 1.0, b * 1.0)

        p = jax.lax.fori_loop(0, 5, body, p0)
        a, b = unpack(p)
        o_ref[...] = jnp.stack([a, b])

    def run_pack():
        x = jax.random.normal(jax.random.PRNGKey(0), (2, SUB, tc)) * 3.0
        f = pl.pallas_call(
            k_pack,
            out_shape=jax.ShapeDtypeStruct((2, SUB, tc), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        y = np.asarray(f(x))
        xr = np.asarray(x)
        bf = lambda v: np.asarray(
            jnp.asarray(v).astype(jnp.bfloat16).astype(jnp.float32))
        a_ref = bf(xr[0])
        for _ in range(5):
            a_ref = bf(a_ref + 1.0)
        np.testing.assert_allclose(y[0], a_ref, rtol=1e-6)
        np.testing.assert_allclose(y[1], bf(xr[1]), rtol=1e-6)
        return y

    probe("bf16x2_pack_fori", run_pack)

    # ---- 3. SMEM scalar -> stacked inv_mass plane, single-op use --------
    def k_mass(m_ref, x_ref, o_ref):
        x = x_ref[...]
        f0 = x[0] * 0.0
        inv_plane = jnp.stack([f0 + m_ref[i] for i in range(d)])
        o_ref[...] = jnp.sum(inv_plane * x * x, axis=0)

    def run_mass():
        m = jnp.arange(1.0, d + 1.0, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (d, SUB, tc))
        f = pl.pallas_call(
            k_mass,
            out_shape=jax.ShapeDtypeStruct((SUB, tc), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        y = np.asarray(f(m, x))
        ref = np.sum(np.asarray(m)[:, None, None] * np.asarray(x) ** 2,
                     axis=0)
        np.testing.assert_allclose(y, ref, rtol=1e-4)
        return y

    probe("smem_inv_plane", run_mass)


if __name__ == "__main__":
    main()
