"""Gaussian-process covariance-structure learning with structure-changing
MCMC.

Reference: /root/reference/examples/gp_structure/ (recursive covariance-
kernel grammar + subtree-replace involutive MH). TPU-native design: instead
of an unbounded recursive kernel-expression tree, the structure space is a
bounded grammar over a fixed arena — kernel type per slot (Switch-style
branch index) + hyperparameters per slot always present — so every
structure's trace has one shape and structure moves are plain MH on the
discrete indices.

Grammar (matching the reference's base kernels): CONST | LINEAR | SE |
PERIODIC, combined by + or * into a depth-2 expression
(op, left_type, right_type).

Run: python examples/gp_structure.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import mh_proposal, mh_selection

# kernel type codes
CONST, LINEAR, SE, PERIODIC = 0, 1, 2, 3


def base_cov(ktype, params, xs1, xs2):
    """Covariance matrix of one base kernel; params = (p0, p1)."""
    d = xs1[:, None] - xs2[None, :]
    prod = xs1[:, None] * xs2[None, :]
    c_const = jnp.exp(params[0]) * jnp.ones_like(d)
    c_lin = jnp.exp(params[0]) * prod
    c_se = jnp.exp(params[0]) * jnp.exp(-0.5 * d * d / jnp.exp(2 * params[1]))
    c_per = jnp.exp(params[0]) * jnp.exp(
        -2.0 * jnp.sin(jnp.pi * jnp.abs(d) / jnp.exp(params[1])) ** 2)
    return jnp.select([ktype == CONST, ktype == LINEAR, ktype == SE,
                       ktype == PERIODIC],
                      [c_const, c_lin, c_se, c_per])


@gen
def gp_model(xs):
    op = gt.bernoulli(0.5) @ "op"               # 0: +, 1: *
    left = gt.uniform_discrete(0, 3) @ "left_type"
    right = gt.uniform_discrete(0, 3) @ "right_type"
    left_params = gt.normal(jnp.zeros(2), 1.0) @ "left_params"
    right_params = gt.normal(jnp.zeros(2), 1.0) @ "right_params"
    log_noise = gt.normal(-2.0, 1.0) @ "log_noise"
    cl = base_cov(left, left_params, xs, xs)
    cr = base_cov(right, right_params, xs, xs)
    cov = jnp.where(op, cl * cr, cl + cr)
    cov = cov + (jnp.exp(2 * log_noise) + 1e-6) * jnp.eye(xs.shape[0])
    ys = gt.mvnormal(jnp.zeros(xs.shape[0]), cov) @ "ys"
    return ys


@gen
def hyper_walk(tr):
    gt.broadcasted_normal(tr["left_params"], 0.3) @ "left_params"
    gt.broadcasted_normal(tr["right_params"], 0.3) @ "right_params"
    gt.normal(tr["log_noise"], 0.2) @ "log_noise"


STRUCT_SEL = select("op", "left_type", "right_type")


def sweep(key, trace):
    k1, k2, k3 = jax.random.split(key, 3)
    # structure move: resample the grammar indices from the prior
    trace, _ = mh_selection(k1, trace, STRUCT_SEL)
    # hyperparameter random walk
    trace, _ = mh_proposal(k2, trace, hyper_walk)
    trace, _ = mh_proposal(k3, trace, hyper_walk)
    return trace


def make_dataset(n=40, seed=0):
    """Periodic + linear trend data."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 4, n)
    ys = 0.8 * xs + np.sin(2 * np.pi * xs / 1.0) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(xs), jnp.asarray(ys)


def main(n_sweeps=1500, seed=0):
    xs, ys = make_dataset()
    obs = choicemap(ys=ys)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    trace, _ = gp_model.generate(k_init, (xs,), obs)

    jit_sweep = jax.jit(sweep)
    structures = []
    for i in range(n_sweeps):
        key, sub = jax.random.split(key)
        trace = jit_sweep(sub, trace)
        if i > n_sweeps // 3:
            structures.append((int(trace["op"]), int(trace["left_type"]),
                               int(trace["right_type"])))

    from collections import Counter
    hist = Counter(structures)
    top = hist.most_common(3)
    names = {0: "CONST", 1: "LIN", 2: "SE", 3: "PER"}
    print("top structures (op, left, right):")
    for (op, l, r), c in top:
        print(f"  {'*' if op else '+'}({names[l]}, {names[r]}): "
              f"{c / len(structures):.2%}")
    # the data is periodic + linear: the posterior should put most mass on
    # structures containing a periodic component
    frac_periodic = np.mean([PERIODIC in (l, r) for (_, l, r) in structures])
    print(f"fraction of structures containing PERIODIC: {frac_periodic:.2%}")
    assert frac_periodic > 0.5, frac_periodic
    print("gp_structure example OK")


if __name__ == "__main__":
    main()
