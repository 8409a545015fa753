"""Compile-time hypothesis probe (VERDICT r4 item 3): Mosaic compile
time for the fused kernels scales ~0.5 s per unit d because every
(d, 8, tc) elementwise op is unrolled over the leading d axis during
vector lowering. If the SAME arithmetic is expressed on a flattened
(d*8, tc) rank-2 array (bit-identical memory layout — f32 tiling is
(8, 128), so the reshape is a no-op), each op should stay ONE Mosaic op
and compile time should collapse, with reshapes back to rank-3 needed
only at the per-chain d-reductions.

This probe compiles two synthetic kernels with identical arithmetic —
~36 elementwise ops + 2 d-reductions per fori iteration, N_ITER
iterations — in both layouts, at several d, on the real TPU, and prints
the compile wall-clock of each. Run: python benchmarks/probe_compile_layout.py

OUTCOME (round 5, measured): REFUTED — rank-2 and rank-3 elementwise
bodies compile identically (interleaved A/B, three reps, d=96/192).
The real compile driver is the fori LOOP CARRY of many d-planes
(a 12-plane carry: d=96 ~14 s, d=192 ~52 s; the same state as VMEM
scratch refs: ~1 s), which is what the _kernel_pair scratch-state
conversion exploits. Kept as the record of the experiment.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ITER = 50
N_OPS = 12      # op-block repetitions per iteration (x3 ops each)


def _body_ops(x, y, m):
    """~3 representative elementwise ops; same code for both layouts."""
    z = x * 1.001 + y
    z = jnp.where(m, z, x)
    y = y + 0.5 * z
    return z, y


def make_kernel(layout, d, tc=128):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rank3 = layout == "rank3"
    shape = (d, 8, tc) if rank3 else (d * 8, tc)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x * 0.5

        def it(i, carry):
            x, y = carry
            m = (y > 0.0)
            for _ in range(N_OPS):
                x, y = _body_ops(x, y, m)
            # two per-chain d-reductions (always rank-3)
            x3 = x if rank3 else x.reshape(d, 8, tc)
            y3 = y if rank3 else y.reshape(d, 8, tc)
            dot = jnp.sum(x3 * y3, axis=0)          # (8, tc)
            x3 = x3 + dot[None] * 1e-6
            x = x3 if rank3 else x3.reshape(d * 8, tc)
            return x, y

        x, y = jax.lax.fori_loop(0, N_ITER, it, (x, y))
        o_ref[...] = x + y

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run, shape


def main(ds=(32, 64, 128, 256)):
    print("| d | rank3 compile+run s | rank2 compile+run s |")
    print("|---|---|---|")
    for d in ds:
        row = [d]
        for layout in ("rank3", "rank2"):
            run, shape = make_kernel(layout, d)
            x = jnp.asarray(np.random.default_rng(0).standard_normal(
                shape), jnp.float32) * 0.1
            t0 = time.time()
            r = run(x)
            float(jnp.sum(r))
            row.append(time.time() - t0)
        print(f"| {row[0]} | {row[1]:.1f} | {row[2]:.1f} |")


if __name__ == "__main__":
    ds = (32, 64, 128, 256)
    if "--big" in sys.argv:
        ds = (256, 512, 768)
    main(ds)
