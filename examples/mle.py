"""Maximum-likelihood estimation of trainable parameters.

Reference: /root/reference/examples/mle — gradient ascent on a gen fn's
trainable parameters given fixed observations, via
accumulate_param_gradients + ParamUpdate.

Run: python examples/mle.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, init_param, param
from gen_tpu.learning import ADAM, ParamUpdate


@gen
def model(xs):
    slope = param("slope")
    intercept = param("intercept")
    log_std = param("log_std")
    gt.normal(slope * xs + intercept, jnp.exp(log_std)) @ "ys"


def main(n_iters=300, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.linspace(-3, 3, 80)
    ys = 1.5 * np.asarray(xs) - 0.7 + 0.4 * rng.standard_normal(80)
    obs = choicemap(ys=jnp.asarray(ys))

    init_param(model, "slope", 0.0)
    init_param(model, "intercept", 0.0)
    init_param(model, "log_std", 0.0)
    update = ParamUpdate(ADAM(0.05), model)

    key = jax.random.PRNGKey(seed)
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        trace, weight = model.generate(sub, (xs,), obs)
        model.accumulate_param_gradients(trace)
        update.apply()

    s = float(model.params["slope"])
    b = float(model.params["intercept"])
    sd = float(jnp.exp(model.params["log_std"]))
    # closed-form MLE for comparison
    X = np.stack([np.asarray(xs), np.ones_like(xs)], axis=1)
    beta = np.linalg.lstsq(X, ys, rcond=None)[0]
    resid_sd = np.sqrt(np.mean((ys - X @ beta) ** 2))
    print(f"MLE slope={s:.4f} (exact {beta[0]:.4f}), "
          f"intercept={b:.4f} (exact {beta[1]:.4f}), "
          f"noise={sd:.4f} (exact {resid_sd:.4f})")
    assert abs(s - beta[0]) < 0.01 and abs(b - beta[1]) < 0.01
    assert abs(sd - resid_sd) < 0.02
    print("mle example OK")


if __name__ == "__main__":
    main()
