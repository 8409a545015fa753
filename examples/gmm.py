"""Gaussian mixture model clustering by fully-vectorized exact Gibbs.

The clustering workload family: every conditional is exact and every
sweep is a handful of fused array ops — no per-point loops, no MH
rejections.

    w ~ dirichlet(alpha)            (mixture weights)
    mu_k ~ normal(0, 5)             (component means, k = 1..K)
    z_i ~ categorical(w)            (assignments, one batched address)
    y_i ~ normal(mu_{z_i}, sigma)   (data)

Sweep (all exact conditionals, applied via one fully-constrained
``update`` each — the same pattern as examples/regression.py's indicator
Gibbs, extended to the whole parameter block):

  z | w, mu, y : N independent categoricals over K (one batched draw)
  mu | z, y    : K conjugate normals from one-hot count/sum reductions
  w | z        : dirichlet(alpha + counts)

Run: python examples/gmm.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen

K, SIGMA, PRIOR_STD = 3, 0.6, 5.0
ALPHA = jnp.ones(K)
TRUE_MU = np.array([-4.0, 0.5, 4.5])
TRUE_W = np.array([0.3, 0.45, 0.25])


def make_dataset(n=300, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.choice(K, size=n, p=TRUE_W)
    return jnp.asarray(rng.normal(TRUE_MU[z], SIGMA)), z


def make_model(n):
    @gen
    def gmm():
        w = gt.dirichlet(ALPHA) @ "w"
        mu = gt.broadcasted_normal(jnp.zeros(K), PRIOR_STD) @ "mu"
        z = gt.categorical(jnp.broadcast_to(w, (n, K))) @ "z"
        gt.normal(mu[z], SIGMA) @ "ys"
        return mu

    return gmm


def sweep(key, trace, ys):
    n = ys.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    w, mu = trace["w"], trace["mu"]

    # z | w, mu, y — N independent exact categoricals
    logits = jnp.log(w)[None, :] - 0.5 * ((ys[:, None] - mu[None, :])
                                          / SIGMA) ** 2
    z = jax.random.categorical(k1, logits, axis=-1)

    # mu | z, y — conjugate normal per component via one-hot reductions
    onehot = z[:, None] == jnp.arange(K)[None, :]
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.sum(jnp.where(onehot, ys[:, None], 0.0), axis=0)
    prec = 1.0 / PRIOR_STD ** 2 + counts / SIGMA ** 2
    mean = (sums / SIGMA ** 2) / prec
    mu_new = mean + jax.random.normal(k2, (K,)) / jnp.sqrt(prec)

    # w | z — dirichlet
    w_new = jax.random.dirichlet(k3, ALPHA + counts)

    cons = choicemap(z=z, mu=mu_new, w=w_new)
    new_trace, _, _, _ = trace.update(None, cons)
    return new_trace


def run_chain(key, ys, n_sweeps=400):
    model = make_model(ys.shape[0])
    k0, k1 = jax.random.split(key)
    trace, _ = model.generate(k0, (), choicemap(ys=ys))

    @jax.jit
    def chain(trace, k):
        def step(tr, sk):
            tr = sweep(sk, tr, ys)
            return tr, (tr["mu"], tr["w"])

        return jax.lax.scan(step, trace, jax.random.split(k, n_sweeps))

    _, (mus, ws) = chain(trace, k1)
    return np.asarray(mus), np.asarray(ws)


def main(n_sweeps=400, seed=0):
    ys, _ = make_dataset()
    mus, ws = run_chain(jax.random.PRNGKey(seed), ys, n_sweeps)
    burn = n_sweeps // 4
    # sort components per sweep (label switching)
    order = np.argsort(mus[burn:], axis=1)
    mu_sorted = np.take_along_axis(mus[burn:], order, axis=1)
    w_sorted = np.take_along_axis(ws[burn:], order, axis=1)
    mu_hat, w_hat = mu_sorted.mean(0), w_sorted.mean(0)
    print("mu:", np.round(mu_hat, 2), "(true", TRUE_MU, ")")
    print("w: ", np.round(w_hat, 2), "(true", TRUE_W, ")")
    return mu_hat, w_hat


if __name__ == "__main__":
    mu_hat, w_hat = main()
    assert np.abs(mu_hat - TRUE_MU).max() < 0.2, mu_hat
    assert np.abs(w_hat - TRUE_W).max() < 0.08, w_hat
    print("OK")
