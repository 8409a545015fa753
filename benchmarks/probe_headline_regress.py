"""Isolate the round-4 headline regression: time the fused HMC kernel's
raw us/step on the bench config (524k chains, regression model, L=10),
independent of ESS statistics. Run on the real TPU from any git rev."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main(n_chains=524288, n_steps=200, reps=3):
    import jax
    import jax.numpy as jnp
    import gen_tpu as gt
    from gen_tpu import gen, choicemap, select
    from gen_tpu.inference.target import FlatTarget
    from gen_tpu.ops.hmc_fused import hmc_chains_fused

    n_points = 50
    xs = jnp.linspace(-3.0, 3.0, n_points)
    rng = np.random.default_rng(0)
    ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(rng.standard_normal(n_points))
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)

    @gen
    def regression_model(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        beta = jnp.stack([slope, intercept])
        gt.normal_linear(X, beta, jnp.exp(log_noise)) @ "ys"
        return slope

    tr, _ = regression_model.generate(jax.random.PRNGKey(1), (X,),
                                      choicemap(ys=ys))
    target = FlatTarget(tr, select("slope", "intercept", "log_noise"))
    vals = jax.random.normal(jax.random.PRNGKey(0), (n_chains, 3)) * 0.3

    def rep(r):
        _, col, _ = hmc_chains_fused(
            jax.random.fold_in(jax.random.PRNGKey(7), r), target.logp,
            vals, n_steps=n_steps, L=10, eps=0.035, collect_idx=0)
        return float(jnp.sum(col[-1]))

    t0 = time.time()
    rep(999)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    ts = []
    for r in range(reps):
        t0 = time.time()
        rep(r)
        ts.append(time.time() - t0)
    t = float(np.median(ts))
    print(f"us_per_step: {t / n_steps * 1e6:.1f}  (n_chains={n_chains}, "
          f"n_steps={n_steps}, reps={ts})")


if __name__ == "__main__":
    main()
