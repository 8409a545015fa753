"""Microbenchmark: pointwise vs sufficient-statistic (Gram) linear-Gaussian
likelihood gradient, at bench.py's scale (524k chains, n=50 points, 10-step
leapfrog). Run on the real TPU: `python benchmarks/micro_linear_lik.py`.

Protocol per CLAUDE.md: fresh key material per rep + host fetch as barrier
(the tunneled backend memoizes identical calls and block_until_ready lies).
"""
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


def logp_pointwise(q):
    s, c, ln = q[0], q[1], q[2]
    sigma = jnp.exp(ln)
    z = (ys - (s * xs + c)) / sigma
    ll = jnp.sum(-0.5 * z * z - jnp.log(sigma) - HALF_LOG_2PI)
    prior = (-0.5 * (s / 2.0) ** 2 - 0.5 * (c / 2.0) ** 2 - 0.5 * ln * ln)
    return ll + prior


# Gram sufficient statistics: A = [x 1 y], G = A^T A (3x3). RSS = u^T G u
# with u = [-s, -c, 1]. Computed from data only -> hoisted out of vmap/scan.
A = jnp.stack([xs, jnp.ones_like(xs), ys], axis=1)
G = A.T @ A


def logp_gram(q):
    s, c, ln = q[0], q[1], q[2]
    u = jnp.stack([-s, -c, 1.0])
    rss = u @ (G @ u)
    ll = -0.5 * rss * jnp.exp(-2.0 * ln) - N_POINTS * (ln + HALF_LOG_2PI)
    prior = (-0.5 * (s / 2.0) ** 2 - 0.5 * (c / 2.0) ** 2 - 0.5 * ln * ln)
    return ll + prior


def make_traj(logp):
    vg = jax.vmap(jax.value_and_grad(logp))

    @jax.jit
    def traj(Q, key):
        M = jax.random.normal(key, Q.shape)

        def leapfrog(carry, _):
            Qc, Mc, Gd = carry
            Mc = Mc + (EPS / 2) * Gd
            Qc = Qc + EPS * Mc
            lp, Gd = vg(Qc)
            Mc = Mc + (EPS / 2) * Gd
            return (Qc, Mc, Gd), lp

        _, g0 = vg(Q)
        (Qf, Mf, _), lps = jax.lax.scan(leapfrog, (Q, M, g0), None, length=L)
        return Qf, jnp.sum(lps[-1])

    return traj


def timeit(traj, label, reps=20):
    key = jax.random.PRNGKey(0)
    Q = 0.1 * jax.random.normal(key, (N_CHAINS, 3))
    Qf, csum = traj(Q, jax.random.fold_in(key, 999))
    float(csum)  # compile + warm
    t0 = time.time()
    for i in range(reps):
        Q, csum = traj(Q, jax.random.fold_in(key, i))
    float(csum)
    dt = (time.time() - t0) / reps
    rate = N_CHAINS * L / dt
    print(f"{label}: {dt*1e3:.2f} ms/traj ({L} leapfrogs, {N_CHAINS} chains)"
          f" = {rate/1e6:.1f}M leapfrog-grads/s")
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    # sanity: identical log-densities
    q = jnp.asarray([0.3, -0.2, 0.1])
    print("logp pointwise:", float(logp_pointwise(q)),
          " gram:", float(logp_gram(q)))
    t_pw = timeit(make_traj(logp_pointwise), "pointwise")
    t_gr = timeit(make_traj(logp_gram), "gram     ")
    print(f"speedup: {t_pw/t_gr:.2f}x")
