"""Probe: can a Pallas TPU kernel stream a large observed dataset through
the logp as SMEM scalars read with a DYNAMIC index inside fori_loop?
(The mechanism for fusing non-collapsible per-point likelihoods —
robust-t regression with n = 10,000 — into the HMC/NUTS kernels.)

Measures: lowering feasibility at n in {1k, 10k}, unroll-factor effect,
and the per-leapfrog cost of the data loop vs a closed-form logp.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"PASS {name}  ({time.time()-t0:.1f}s)  {out}")
        return True
    except Exception as e:
        print(f"FAIL {name}  ({time.time()-t0:.1f}s)  {type(e).__name__}: "
              + str(e).split(chr(10))[0][:300])
        return False


def run(n_data, unroll, n_loops=20, tile=1024):
    """Kernel: acc += sum_i -log1p(((y_i - a*x_i - b)/s)^2) over a fori
    data loop, repeated n_loops times (imitating leapfrogs)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, tc = 8, tile // 8
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, n_data)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)

    def kernel(d_ref, a_ref, b_ref, o_ref):
        av = a_ref[...]
        bv = b_ref[...]
        f0 = av * 0.0

        def data_term(av, bv):
            def body(j, acc):
                for u in range(unroll):
                    i = j * unroll + u
                    x_i = d_ref[0, i]
                    y_i = d_ref[1, i]
                    z = (f0 + y_i) - av * x_i - bv
                    acc = acc - jnp.log1p(z * z)
                return acc
            return jax.lax.fori_loop(0, n_data // unroll, body, f0)

        def outer(t, acc):
            return acc + data_term(av + 0.0001 * acc, bv)

        o_ref[...] = jax.lax.fori_loop(0, n_loops, outer, f0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, tc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    jf = jax.jit(f)
    t0 = time.time()
    y = np.asarray(jf(data, a, b))
    compile_s = time.time() - t0

    # reference for correctness (first outer iteration only is hard to
    # replicate; instead run with n_loops=1 semantics via acc feedback —
    # easier: recompute exactly in numpy)
    an, bn, dn = (np.asarray(a, np.float64), np.asarray(b, np.float64),
                  np.asarray(data, np.float64))
    acc = np.zeros_like(an)
    for t in range(n_loops):
        av = an + 0.0001 * acc
        z = dn[1][:, None, None] - av[None] * dn[0][:, None, None] - bn[None]
        acc = acc - np.log1p(z * z).sum(0)
    err = np.max(np.abs((y - acc) / (np.abs(acc) + 1e-6)))

    # timing: fresh value each rep + host fetch barrier
    reps = 3
    t0 = time.time()
    for r in range(reps):
        y = jf(data, a + 1e-6 * r, b)
        float(jnp.sum(y))
    dt = (time.time() - t0) / reps
    per_point_ns = dt / n_loops / n_data * 1e9
    return dict(n=n_data, unroll=unroll, compile_s=round(compile_s, 1),
                rel_err=float(err), ms_per_call=round(dt * 1e3, 2),
                ns_per_point_loop=round(per_point_ns, 2))


def main():
    print("devices:", jax.devices())
    for n_data, unroll in [(1024, 1), (1024, 8), (10240, 8), (10240, 32)]:
        probe(f"smem_stream n={n_data} unroll={unroll}",
              lambda n=n_data, u=unroll: run(n, u))


if __name__ == "__main__":
    main()


def run_vmem_blocks(n_data, n_loops=20, tile=1024):
    """Variant B: data pre-broadcast to (n/8, 8, 128) VMEM blocks; chains
    processed in 8 sublane-groups of 128 (group row lane-replicated
    across sublanes). Each fori step consumes 8 datapoints x 128 chains
    per vreg op — no scalar splats."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, tc = 8, tile // 8
    assert tc == 128
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, n_data)), jnp.float32)
    # pre-broadcast OUTSIDE the kernel: (k, n/8, 8, 128)
    datab = jnp.broadcast_to(
        data.reshape(2, n_data // 8, 8, 1), (2, n_data // 8, 8, 128))
    a = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)

    def kernel(d_ref, a_ref, b_ref, o_ref):
        av = a_ref[...]
        bv = b_ref[...]
        f0 = av * 0.0

        def data_term(av, bv):
            rows = []
            for g in range(8):
                ag = jnp.broadcast_to(av[g:g + 1, :], (8, 128))
                bg = jnp.broadcast_to(bv[g:g + 1, :], (8, 128))

                def body(j, acc):
                    x_j = d_ref[0, j]      # (8, 128) = 8 points
                    y_j = d_ref[1, j]
                    z = y_j - ag * x_j - bg
                    return acc - jnp.log1p(z * z)

                accg = jax.lax.fori_loop(0, n_data // 8, body, f0)
                rows.append(jnp.sum(accg, axis=0, keepdims=True))
            return jnp.concatenate(rows, axis=0)

        def outer(t, acc):
            return acc + data_term(av + 0.0001 * acc, bv)

        o_ref[...] = jax.lax.fori_loop(0, n_loops, outer, f0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, tc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    jf = jax.jit(f)
    t0 = time.time()
    y = np.asarray(jf(datab, a, b))
    compile_s = time.time() - t0

    an, bn, dn = (np.asarray(a, np.float64), np.asarray(b, np.float64),
                  np.asarray(data, np.float64))
    acc = np.zeros_like(an)
    for t in range(n_loops):
        av = an + 0.0001 * acc
        z = dn[1][:, None, None] - av[None] * dn[0][:, None, None] - bn[None]
        acc = acc - np.log1p(z * z).sum(0)
    err = np.max(np.abs((y - acc) / (np.abs(acc) + 1e-6)))

    reps = 3
    t0 = time.time()
    for r in range(reps):
        y = jf(datab, a + 1e-6 * r, b)
        float(jnp.sum(y))
    dt = (time.time() - t0) / reps
    return dict(variant="vmem_blocks", n=n_data,
                compile_s=round(compile_s, 1), rel_err=float(err),
                ms_per_call=round(dt * 1e3, 2),
                ns_per_point_loop=round(dt / n_loops / n_data * 1e9, 2))


def run_xla_baseline(n_data, n_loops=20, n_chains=1024):
    """XLA doing the identical (chains x data) robust-t sum, for the
    honest comparison target."""
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, n_data)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n_chains,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_chains,)), jnp.float32)

    @jax.jit
    def f(a, b):
        def outer(t, acc):
            av = a + 0.0001 * acc
            z = (data[1][None, :] - av[:, None] * data[0][None, :]
                 - b[:, None])
            return acc - jnp.sum(jnp.log1p(z * z), axis=1)
        return jax.lax.fori_loop(0, n_loops, outer, jnp.zeros_like(a))

    y = f(a, b)
    float(jnp.sum(y))
    reps = 3
    t0 = time.time()
    for r in range(reps):
        y = f(a + 1e-6 * r, b)
        float(jnp.sum(y))
    dt = (time.time() - t0) / reps
    return dict(variant="xla", n=n_data, ms_per_call=round(dt * 1e3, 2),
                ns_per_point_loop=round(dt / n_loops / n_data * 1e9, 2))


def main_b():
    print("devices:", jax.devices())
    for n_data in (1024, 10240):
        probe(f"vmem_blocks n={n_data}",
              lambda n=n_data: run_vmem_blocks(n))
    for n_data in (10240,):
        probe(f"xla n={n_data}", lambda n=n_data: run_xla_baseline(n))


def run_multiacc(n_data, unroll=8, n_acc=4, n_loops=20, tile=1024):
    """SMEM streaming with n_acc independent accumulators: breaks the
    loop-carried add dependency chain (VPU latency-bound otherwise)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, tc = 8, tile // 8
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, n_data)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((SUB, tc)), jnp.float32)

    def kernel(d_ref, a_ref, b_ref, o_ref):
        av = a_ref[...]
        bv = b_ref[...]
        f0 = av * 0.0

        def data_term(av, bv):
            def body(j, accs):
                accs = list(accs)
                for u in range(unroll):
                    i = j * unroll + u
                    z = (f0 + d_ref[1, i]) - av * d_ref[0, i] - bv
                    k = u % n_acc
                    accs[k] = accs[k] - jnp.log1p(z * z)
                return tuple(accs)
            accs = jax.lax.fori_loop(0, n_data // unroll, body,
                                     tuple(f0 for _ in range(n_acc)))
            out = accs[0]
            for k in range(1, n_acc):
                out = out + accs[k]
            return out

        def outer(t, acc):
            return acc + data_term(av + 0.0001 * acc, bv)

        o_ref[...] = jax.lax.fori_loop(0, n_loops, outer, f0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, tc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    jf = jax.jit(f)
    y = np.asarray(jf(data, a, b))

    an, bn, dn = (np.asarray(a, np.float64), np.asarray(b, np.float64),
                  np.asarray(data, np.float64))
    acc = np.zeros_like(an)
    for t in range(n_loops):
        av = an + 0.0001 * acc
        z = dn[1][:, None, None] - av[None] * dn[0][:, None, None] - bn[None]
        acc = acc - np.log1p(z * z).sum(0)
    err = np.max(np.abs((y - acc) / (np.abs(acc) + 1e-6)))

    reps = 3
    t0 = time.time()
    for r in range(reps):
        y = jf(data, a + 1e-6 * r, b)
        float(jnp.sum(y))
    dt = (time.time() - t0) / reps
    return dict(variant=f"multiacc{n_acc}_u{unroll}", n=n_data,
                rel_err=float(err), ms_per_call=round(dt * 1e3, 2),
                ns_per_point_loop=round(dt / n_loops / n_data * 1e9, 2))


def main_c():
    print("devices:", jax.devices())
    for unroll, n_acc in [(8, 4), (16, 4), (16, 8)]:
        probe(f"multiacc n=10240 u={unroll} a={n_acc}",
              lambda u=unroll, a=n_acc: run_multiacc(10240, u, a))
    # SMEM capacity scout: 64k points x 2 arrays = 512KB
    probe("smem_capacity n=65536",
          lambda: run_multiacc(65536, 16, 4, n_loops=4))
