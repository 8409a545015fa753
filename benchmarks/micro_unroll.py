"""Microbenchmark 2: leapfrog scan vs unrolled, pointwise vs Gram logp,
plus a full HMC step (momenta RNG + accept) variant. Real-TPU protocol:
fresh keys per rep + host fetch barrier."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CHAINS = 524288
N_POINTS = 50
L = 10
EPS = 0.035
HALF_LOG_2PI = 0.9189385332046727

rng = np.random.default_rng(0)
xs = jnp.linspace(-3.0, 3.0, N_POINTS)
ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(rng.standard_normal(N_POINTS))

A = jnp.stack([xs, jnp.ones_like(xs), ys], axis=1)
G = A.T @ A


def logp_gram(q):
    s, c, ln = q[0], q[1], q[2]
    u = jnp.stack([-s, -c, 1.0])
    rss = u @ (G @ u)
    ll = -0.5 * rss * jnp.exp(-2.0 * ln) - N_POINTS * (ln + HALF_LOG_2PI)
    prior = (-0.5 * (s / 2.0) ** 2 - 0.5 * (c / 2.0) ** 2 - 0.5 * ln * ln)
    return ll + prior


def logp_pointwise(q):
    s, c, ln = q[0], q[1], q[2]
    sigma = jnp.exp(ln)
    z = (ys - (s * xs + c)) / sigma
    ll = jnp.sum(-0.5 * z * z - jnp.log(sigma) - HALF_LOG_2PI)
    prior = (-0.5 * (s / 2.0) ** 2 - 0.5 * (c / 2.0) ** 2 - 0.5 * ln * ln)
    return ll + prior


def make_step(logp, unroll):
    """One full vectorized HMC step: momenta, L leapfrogs, MH accept."""
    vg = jax.vmap(jax.value_and_grad(logp))

    @jax.jit
    def step(Q, lp0, G0, key):
        km, ka = jax.random.split(key)
        M0 = jax.random.normal(km, Q.shape)

        def leapfrog(carry, _):
            Qc, Mc, Gd = carry
            Mc = Mc + (EPS / 2) * Gd
            Qc = Qc + EPS * Mc
            lp, Gd = vg(Qc)
            Mc = Mc + (EPS / 2) * Gd
            return (Qc, Mc, Gd), lp

        (Qn, Mn, Gn), lps = jax.lax.scan(
            leapfrog, (Q, M0, G0), None, length=L, unroll=unroll)
        lpn = lps[-1]
        alpha = lpn - lp0 - 0.5 * jnp.sum(Mn * Mn, -1) + 0.5 * jnp.sum(M0 * M0, -1)
        acc = jnp.log(jax.random.uniform(ka, alpha.shape)) < alpha
        Q = jnp.where(acc[:, None], Qn, Q)
        lp = jnp.where(acc, lpn, lp0)
        Gd = jnp.where(acc[:, None], Gn, G0)
        return Q, lp, Gd, acc, Q[:, 0]

    return step, vg


def timeit(label, step, vg, reps=30):
    key = jax.random.PRNGKey(0)
    Q = 0.1 * jax.random.normal(key, (N_CHAINS, 3))
    lp, Gd = vg(Q)
    Q2, lp2, G2, acc, s = step(Q, lp, Gd, jax.random.fold_in(key, 10_000))
    float(jnp.sum(s))
    t0 = time.time()
    for i in range(reps):
        Q, lp, Gd, acc, s = step(Q, lp, Gd, jax.random.fold_in(key, i))
    csum = float(jnp.sum(s))
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms/step  accrate={float(jnp.mean(acc)):.2f}"
          f"  ({N_CHAINS*L/dt/1e6:.0f}M lf-grads/s)")
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, logp in [("gram", logp_gram), ("pointwise", logp_pointwise)]:
        for unroll in (1, 10):
            step, vg = make_step(logp, unroll)
            timeit(f"{name:9s} unroll={unroll:2d}", step, vg)
