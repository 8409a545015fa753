"""Bisect what makes the fused HMC kernel's first compile slow (~10 min in
bench.py). Each config runs in a FRESH subprocess (no in-process caches).

One axis varied at a time off the full bench config (model logp, 524288
chains, n_steps=500, L=10): grid size (chain count), n_steps, L, and
scalarized-model vs trivial logp.
"""
import subprocess
import sys
import time

CASES = [
    ("full_model_524k_s500_L10", "model,524288,500,10"),
    ("nsteps_model_524k_s10_L10", "model,524288,10,10"),
    ("grid_model_8k_s500_L10", "model,8192,500,10"),
    ("logp_simple_524k_s500_L10", "simple,524288,500,10"),
    ("L_model_524k_s500_L1", "model,524288,500,1"),
]

CHILD = r"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
kind, n, n_steps, L = sys.argv[1].split(",")
n, n_steps, L = int(n), int(n_steps), int(L)
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
    jax.random.PRNGKey(1), logp, v0, n_steps=n_steps, L=L, eps=0.05,
    collect_idx=0, use_pallas=True)
float(jnp.sum(coll[-1]))
t1 = time.time()
# second call, fresh key: compiled-cache steady state
vals, coll, accs = hmc_chains_fused(
    jax.random.PRNGKey(2), logp, v0, n_steps=n_steps, L=L, eps=0.05,
    collect_idx=0, use_pallas=True)
float(jnp.sum(coll[-1]))
t2 = time.time()
print(f"compile+run {t1-t0:.1f}s run {t2-t1:.1f}s", flush=True)
"""

if __name__ == "__main__":
    for name, arg in CASES:
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD, arg],
                           capture_output=True, text=True, timeout=1800)
        out = [l for l in r.stdout.splitlines() if "compile+run" in l]
        print(f"{name}: {out[0] if out else 'FAILED: ' + r.stderr[-300:]}"
              f" (wall {time.time()-t0:.0f}s)", flush=True)
