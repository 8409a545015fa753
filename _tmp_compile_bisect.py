import time, sys
import jax, jax.numpy as jnp, numpy as np
import gen_tpu as gt
from gen_tpu.ops.hmc_fused import hmc_chains_fused

def logp(x):
    return -0.5 * jnp.sum(x * x)

v0 = jax.random.normal(jax.random.PRNGKey(0), (8192, 3))
for n_steps, L in [(10, 10), (100, 10)]:
    t0 = time.time()
    vals, coll, accs = hmc_chains_fused(
        jax.random.PRNGKey(1), logp, v0, n_steps=n_steps, L=L, eps=0.3,
        use_pallas=True)
    float(jnp.sum(coll[-1]))
    print(f"n_steps={n_steps} L={L}: compile+run {time.time()-t0:.1f}s",
          flush=True)
