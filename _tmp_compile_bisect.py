"""Bisect what makes the fused HMC kernel's first compile slow (~10 min in
bench.py). Each config runs in a FRESH subprocess (no in-process caches).

Axes: chain count (grid size), n_steps, and simple-vs-scalarized logp.
"""
import subprocess
import sys

CASES = {
    "simple_8k_s10": "simple,8192,10",
    "simple_524k_s500": "simple,524288,500",
    "model_8k_s10": "model,8192,10",
    "model_524k_s500": "model,524288,500",
}

CHILD = r"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
kind, n, n_steps = sys.argv[1].split(",")
n, n_steps = int(n), int(n_steps)
from gen_tpu.ops.hmc_fused import hmc_chains_fused

if kind == "simple":
    def logp(x):
        return -0.5 * jnp.sum(x * x)
else:
    import gen_tpu as gt
    from gen_tpu import gen, choicemap, select
    from gen_tpu.inference.target import FlatTarget
    xs = jnp.linspace(-3.0, 3.0, 50)
    rng = np.random.default_rng(0)
    ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(rng.standard_normal(50))
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)

    @gen
    def model(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        beta = jnp.stack([slope, intercept])
        gt.normal_linear(X, beta, jnp.exp(log_noise)) @ "ys"

    tr, _ = model.generate(jax.random.PRNGKey(1), (X,), choicemap(ys=ys))
    logp = FlatTarget(tr, select("slope", "intercept", "log_noise")).logp

v0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, 3))
t0 = time.time()
vals, coll, accs = hmc_chains_fused(
    jax.random.PRNGKey(1), logp, v0, n_steps=n_steps, L=10, eps=0.05,
    collect_idx=0, use_pallas=True)
float(jnp.sum(coll[-1]))
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
"""

for name, arg in CASES.items():
    r = subprocess.run([sys.executable, "-c", CHILD, arg],
                       capture_output=True, text=True, timeout=1800)
    out = [l for l in r.stdout.splitlines() if "compile+run" in l]
    print(f"{name}: {out[0] if out else 'FAILED: ' + r.stderr[-300:]}",
          flush=True)
