import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gen_tpu.ops.nuts_fused import nuts_chains_fused
from gen_tpu.inference.nuts_fsm import nuts_fsm_paired

sds = jnp.array([1.0, 3.0, 0.5, 2.0])


def logp(x):
    return (-0.5 * jnp.sum((x / sds) ** 2)
            - 0.3 * x[0] * x[2] - 0.1 * x[1] * x[3])


n, d, pairs, max_depth = 128, 4, 40, 5
KEY = jax.random.PRNGKey(0)
vals0 = jax.random.normal(KEY, (n, d)) * sds

rng = np.random.default_rng(7)
z = rng.standard_normal((pairs, n, d)).astype(np.float32)
us = [rng.random((pairs, n)).astype(np.float32) for _ in range(7)]
inj = (z, *us)

with jax.enable_x64(False):
    vals_k, hist_k, hcnt_k, cnt_k, stats_k = nuts_chains_fused(
        jax.random.PRNGKey(1), logp, vals0, num_ticks=2 * pairs, eps=0.45,
        max_depth=max_depth, collect_idx=2, injected_rng=inj,
        interpret=True, paired=True)

    vag = jax.value_and_grad(logp)
    inj_chain = tuple(jnp.moveaxis(jnp.asarray(x), 0, 1) for x in inj)
    res_r, (hist_r, hcnt_r) = jax.vmap(
        lambda kk, t, *xs: nuts_fsm_paired(
            kk, vag, t, 0.45, pairs, max_depth=max_depth,
            injected_rng=xs, collect_idx=2, ckpt_bf16=True))(
        jax.random.split(jax.random.PRNGKey(2), n), vals0, *inj_chain)

print("counts kernel:", np.asarray(cnt_k)[:10])
print("counts twin:  ", np.asarray(res_r.counts)[:10])
np.testing.assert_array_equal(np.asarray(cnt_k), np.asarray(res_r.counts))
np.testing.assert_array_equal(np.asarray(hcnt_k), np.asarray(hcnt_r.T))
np.testing.assert_allclose(np.asarray(hist_k), np.asarray(hist_r.T),
                           rtol=1e-5, atol=1e-5)
np.testing.assert_allclose(np.asarray(vals_k), np.asarray(res_r.theta),
                           rtol=1e-5, atol=1e-5)
np.testing.assert_allclose(np.asarray(stats_k["mean_accept"]),
                           np.asarray(res_r.mean_accept), rtol=1e-5)
np.testing.assert_allclose(np.asarray(stats_k["mean_depth"]),
                           np.asarray(res_r.mean_depth), rtol=1e-5)
assert int(cnt_k.min()) > 0
print("PAIR KERNEL == TWIN, tick-exact OK")
