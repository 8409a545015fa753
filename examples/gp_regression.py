"""GP regression end to end: collapsed hyperparameter inference + exact
posterior predictive.

Complements examples/gp_structure.py (which learns the kernel STRUCTURE
over a grammar): here the kernel is fixed (RBF) and the full Bayesian
workflow runs on the collapsed marginal —

  1. priors on (log variance, log lengthscale, log noise),
  2. `gp_marginal` scores the observation vector by the EXACT marginal
     (one Cholesky; no latent function values in the trace),
  3. adaptive NUTS over the hyperparameters via `sample_posterior`,
  4. posterior-averaged predictive at test inputs via `gp_posterior`,
     with coverage checked against the held-out truth.

Run: python examples/gp_regression.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen
from gen_tpu.inference import sample_posterior
from gen_tpu.models import gp_marginal, gp_posterior, rbf

TRUE = dict(variance=1.5, lengthscale=0.6, noise=0.15)


def make_dataset(n=50, n_test=20, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.sort(rng.uniform(-3, 3, n + n_test))
    f = np.sin(2.0 * xs) * np.exp(-0.1 * xs ** 2) * 1.2
    ys = f + TRUE["noise"] * rng.standard_normal(n + n_test)
    idx = rng.permutation(n + n_test)
    tr_i, te_i = np.sort(idx[:n]), np.sort(idx[n:])
    return (jnp.asarray(xs[tr_i]), jnp.asarray(ys[tr_i]),
            jnp.asarray(xs[te_i]), jnp.asarray(f[te_i]))


GPD = gp_marginal("rbf", n_theta=2)


def run(key, xs, ys, num_chains=4, num_warmup=300, num_samples=300):
    @gen
    def model():
        log_var = gt.normal(0.0, 1.0) @ "log_var"
        log_ell = gt.normal(0.0, 1.0) @ "log_ell"
        log_noise = gt.normal(-2.0, 1.0) @ "log_noise"
        GPD(xs, jnp.exp(log_var), jnp.exp(log_ell),
            jnp.exp(log_noise)) @ "ys"

    return sample_posterior(key, model, (), choicemap(ys=ys),
                            num_chains=num_chains, num_warmup=num_warmup,
                            num_samples=num_samples, max_depth=6), model


def predict(key, out, xs, ys, xstar, num_draws=200):
    """Posterior-averaged predictive: vmap gp_posterior over thinned
    hyperparameter draws."""
    def flat(a):
        a = jnp.asarray(a)
        return a.reshape(-1)

    lv, le, ln = (flat(out.samples[k]) for k in
                  ("log_var", "log_ell", "log_noise"))
    idx = jnp.linspace(0, lv.shape[0] - 1, num_draws).astype(int)

    def one(i):
        return gp_posterior(rbf, xs, ys, (jnp.exp(lv[i]), jnp.exp(le[i])),
                            jnp.exp(ln[i]), xstar)

    means, covs = jax.vmap(one)(idx)
    mean = means.mean(axis=0)
    # law of total variance across hyperparameter draws
    var = jnp.diagonal(covs, axis1=1, axis2=2).mean(axis=0) \
        + means.var(axis=0)
    return mean, jnp.sqrt(var)


def main(n=50, num_chains=4, num_warmup=300, num_samples=300, seed=0):
    xs, ys, xs_test, f_test = make_dataset(n)
    out, _ = run(jax.random.PRNGKey(seed), xs, ys, num_chains, num_warmup,
                 num_samples)
    s = out.summary
    print("posterior (log-space):",
          {k: round(float(s[k]["mean"]), 3) for k in s},
          "max rhat:", round(max(float(s[k]["rhat"]) for k in s), 3))
    mean, sd = predict(jax.random.PRNGKey(seed + 1), out, xs, ys, xs_test)
    cover = np.mean(np.abs(np.asarray(mean) - np.asarray(f_test))
                    <= 2.5 * np.asarray(sd))
    rmse = float(np.sqrt(np.mean((np.asarray(mean)
                                  - np.asarray(f_test)) ** 2)))
    print(f"held-out RMSE {rmse:.3f}, 2.5-sigma coverage {cover:.2f}")
    return rmse, cover, s


if __name__ == "__main__":
    rmse, cover, s = main()
    assert rmse < 0.25, rmse
    assert cover >= 0.85, cover
    assert max(float(s[k]["rhat"]) for k in s) < 1.1
    print("OK")
