"""Prototype: fused multi-step HMC as a single Pallas kernel.

The XLA hmc_chains path is HBM-bound (~255 GB/s effective): every
leapfrog's logp reduce breaks fusion and round-trips the chain state. The
Pallas kernel keeps the whole chain block in VMEM for all n_steps x L
leapfrogs; HBM traffic collapses to one state read + the per-step collect
row write.

Layout lesson (v1 of this prototype measured it): coordinates as (1, T)
rows engage 1 of 8 VPU sublanes -> only 1.4x over XLA. v2 stores each
coordinate as a FULL-TILE plane: values are (D, 8, N/8), so every
elementwise op runs at full (8, 128) VPU width. Momenta use Box-Muller
with the cos+sin pair trick (2 normals per uniform pair).

Run on TPU: python benchmarks/proto_hmc_pallas.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CHAINS = 524288
N_POINTS = 50
L = 10
EPS = 0.035
HALF_LOG_2PI = 0.9189385332046727
TILE = 1024            # chains per grid step
SUB = 8                # sublane rows per plane
D = 3                  # intercept, log_noise, slope (sorted-address order)

rng = np.random.default_rng(0)
xs = np.linspace(-3.0, 3.0, N_POINTS)
ys = 0.7 * xs - 0.4 + 0.5 * rng.standard_normal(N_POINTS)
A = np.stack([xs, np.ones_like(xs), ys], axis=1)
G = np.asarray(A.T @ A, np.float32)   # data Gram; numpy scalars -> literals


def vag_planes(v):
    """(D, 8, Tc) -> logp (8, Tc), grad (D, 8, Tc). Hand-derived for the
    prototype; every op is a full-tile elementwise op."""
    c, ln, s = v[0], v[1], v[2]
    inv_s2 = jnp.exp(-2.0 * ln)
    rss = (G[0, 0] * s * s + G[1, 1] * c * c + G[2, 2]
           + 2.0 * (G[0, 1] * s * c - G[0, 2] * s - G[1, 2] * c))
    lp = (-0.5 * rss * inv_s2 - N_POINTS * (ln + HALF_LOG_2PI)
          - 0.125 * s * s - 0.125 * c * c - 0.5 * ln * ln)
    d_rss_ds = 2.0 * (G[0, 0] * s + G[0, 1] * c - G[0, 2])
    d_rss_dc = 2.0 * (G[1, 1] * c + G[0, 1] * s - G[1, 2])
    g_s = -0.5 * d_rss_ds * inv_s2 - 0.25 * s
    g_c = -0.5 * d_rss_dc * inv_s2 - 0.25 * c
    g_ln = rss * inv_s2 - N_POINTS - ln
    return lp, jnp.stack([g_c, g_ln, g_s])


def _uniform(bits):
    from jax.experimental.pallas import tpu as pltpu
    mant = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                       jnp.uint32(9))
    f = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _normals_planes(n_planes, plane_shape):
    """(n_planes, *plane_shape) standard normals: Box-Muller pairs, cos+sin."""
    from jax.experimental.pallas import tpu as pltpu
    pairs = (n_planes + 1) // 2
    shape = (pairs,) + plane_shape
    tiny = jnp.float32(1.1754944e-38)
    u1 = jnp.maximum(_uniform(pltpu.prng_random_bits(shape)), tiny)
    u2 = _uniform(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * np.pi) * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    return z[:n_planes]


def _kernel(n_steps, v_ref, seed_ref, out_ref, vout_ref, acc_ref):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0).astype(jnp.uint32)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (pid * jnp.uint32(0x9E3779B9)))

    v0 = v_ref[...]
    lp0, g0 = vag_planes(v0)
    acc0 = jnp.zeros_like(lp0)
    plane = lp0.shape

    def step(i, carry):
        v, lp, g, acc = carry
        jit_bits = _uniform(pltpu.prng_random_bits((8, 128)))
        eps = EPS * (0.8 + 0.4 * jit_bits[0, 0])
        mom0 = _normals_planes(D, plane)

        def leap(_, c):
            v, m, g, lp = c
            m = m + (eps * 0.5) * g
            v = v + eps * m
            lp, g = vag_planes(v)
            m = m + (eps * 0.5) * g
            return (v, m, g, lp)

        v_new, m_new, g_new, lp_new = jax.lax.fori_loop(
            0, L, leap, (v, mom0, g, lp))
        kin0 = 0.5 * jnp.sum(mom0 * mom0, axis=0)
        kin1 = 0.5 * jnp.sum(m_new * m_new, axis=0)
        alpha = lp_new - lp - kin1 + kin0            # (8, Tc)
        alpha = jnp.where(jnp.isnan(alpha), -jnp.inf, alpha)
        u = jnp.maximum(_uniform(pltpu.prng_random_bits(plane)),
                        jnp.float32(1.1754944e-38))
        accept = jnp.log(u) < alpha                  # (8, Tc)
        v = jnp.where(accept[None], v_new, v)
        lp = jnp.where(accept, lp_new, lp)
        g = jnp.where(accept[None], g_new, g)
        acc = acc + accept.astype(jnp.float32)
        out_ref[pl.ds(i, 1)] = v[2][None]            # slope plane
        return (v, lp, g, acc)

    v, lp, g, acc = jax.lax.fori_loop(0, n_steps, step, (v0, lp0, g0, acc0))
    vout_ref[...] = v
    acc_ref[...] = acc


@functools.partial(jax.jit, static_argnums=(2,))
def hmc_fused(values, seed, n_steps):
    """values: (D, 8, N/8) float32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    d, sub, cols = values.shape
    tc = TILE // SUB
    grid = cols // tc
    out, vout, acc = pl.pallas_call(
        functools.partial(_kernel, n_steps),
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((n_steps, sub, cols), jnp.float32),
                   jax.ShapeDtypeStruct((d, sub, cols), jnp.float32),
                   jax.ShapeDtypeStruct((sub, cols), jnp.float32)),
        in_specs=[pl.BlockSpec((d, sub, tc), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((n_steps, sub, tc), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((d, sub, tc), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((sub, tc), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(values, seed)
    return out, vout, acc


def main():
    key = jax.random.PRNGKey(0)
    init = jnp.array([-0.335, -0.822, 0.796], jnp.float32)[:, None, None]
    v0 = init + 0.1 * jax.random.normal(
        key, (D, SUB, N_CHAINS // SUB), jnp.float32)
    seed = jnp.array([17, 29], jnp.uint32)

    out100 = None
    for n_steps in (100, 500):
        out, vout, acc = hmc_fused(v0, seed, n_steps)
        float(jnp.sum(out[-1]))
        for rep in range(3):
            seed_r = jnp.array([17, 29 + rep + 1], jnp.uint32)
            t0 = time.time()
            out, vout, acc = hmc_fused(v0, seed_r, n_steps)
            cs = float(jnp.sum(out[-1]))
            el = time.time() - t0
            print(f"n={n_steps} rep{rep}: {el*1e3:.1f} ms total "
                  f"({el*1e6/n_steps:.0f} us/step) checksum {cs:.1f}")
        if n_steps == 100:
            out100 = np.asarray(out)
    acc_rate = float(jnp.mean(acc)) / n_steps
    print("accept:", acc_rate)
    vv = np.asarray(vout).reshape(D, -1)
    print("intercept mean/sd:", vv[0].mean(), vv[0].std(),
          "(exact -0.33517 / 0.06278)")
    print("log_noise mean/sd:", vv[1].mean(), vv[1].std(),
          "(exact -0.82242 / 0.10346)")
    print("slope mean/sd:", vv[2].mean(), vv[2].std(),
          "(exact 0.79644 / 0.03554)")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as B
    ess = B.autocorr_ess(out100.reshape(100, -1))
    print(f"ESS/draw {ess/out100.size:.3f}")


if __name__ == "__main__":
    main()
