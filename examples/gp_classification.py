"""GP binary classification: elliptical slice sampling over the latent
function.

The workload elliptical slice sampling exists for (reference:
src/inference/elliptical_slice.jl — MVN-prior addresses with non-Gaussian
likelihoods). Model:

    f ~ MVN(0, K_rbf(xs))             (latent function at the inputs)
    y_i ~ bernoulli(sigmoid(f_i))     (labels)

ESS resamples the full (n,)-dimensional latent rejection-free each sweep;
the whole chain is one ``lax.scan``. The kernel is held fixed: naive MH
on hyperparameters given f suffocates (changing the lengthscale under a
fixed smooth f moves the prior density by tens of nats — the standard
fix is whitened reparameterization; for hyperparameter LEARNING with a
Gaussian likelihood use the collapsed ``gp_marginal`` instead,
examples/gp_regression.py).

This example caught a real library bug: the ESS threshold was computed as
update_weight minus the prior-score change — analytically the likelihood
ratio, but a catastrophic float32 cancellation for ill-conditioned GP
priors (the sampler silently degenerated to ~prior draws). The fix
computes the likelihood ratio directly via ``project`` on the complement
selection (inference/elliptical_slice.py).

Run: python examples/gp_classification.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen
from gen_tpu.inference import elliptical_slice
from gen_tpu.models import rbf

JITTER = 1e-6
AMP2, ELL = 4.0, 1.0


def make_dataset(n=60, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.sort(rng.uniform(-3, 3, n))
    f_true = 3.0 * np.sin(1.5 * xs)
    p = 1.0 / (1.0 + np.exp(-f_true))
    ys = (rng.uniform(size=n) < p).astype(bool)
    return jnp.asarray(xs), jnp.asarray(ys), np.asarray(f_true)


def make_model(xs):
    n = xs.shape[0]
    K = rbf(xs, xs, AMP2, ELL) + JITTER * jnp.eye(n)

    @gen
    def model():
        f = gt.mvnormal(jnp.zeros(n), K) @ "f"
        gt.bernoulli(jax.nn.sigmoid(f)) @ "ys"
        return f

    return model, K


def run_chain(key, xs, ys, n_sweeps=1500):
    model, K = make_model(xs)
    n = xs.shape[0]
    k0, k1 = jax.random.split(key)
    trace, _ = model.generate(k0, (), choicemap(ys=ys))

    @jax.jit
    def chain(trace, k):
        def step(tr, sk):
            tr = elliptical_slice(sk, tr, "f", jnp.zeros(n), K)
            return tr, tr["f"]

        return jax.lax.scan(step, trace, jax.random.split(k, n_sweeps))

    _, fs = chain(trace, k1)
    return np.asarray(fs)


def main(n_sweeps=1500, seed=0):
    xs, ys, f_true = make_dataset()
    fs = run_chain(jax.random.PRNGKey(seed), xs, ys, n_sweeps)
    burn = n_sweeps // 3
    f_bar = fs[burn:].mean(axis=0)
    corr = float(np.corrcoef(f_bar, f_true)[0, 1])
    ysn = np.asarray(ys)
    p = 1.0 / (1.0 + np.exp(-fs[burn:]))
    ll = float(np.mean(np.sum(np.log(np.where(ysn, p, 1 - p)), axis=1)))
    ll0 = len(ysn) * np.log(0.5)
    print(f"corr(posterior mean f, true f) = {corr:.3f}; "
          f"mean loglik {ll:.1f} (f=0 gives {ll0:.1f})")
    return corr, ll, ll0


if __name__ == "__main__":
    corr, ll, ll0 = main()
    assert corr > 0.85, corr
    assert ll > ll0 + 5.0, (ll, ll0)
    print("OK")
