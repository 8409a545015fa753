"""Same-session A/B of the pair-scheduled fused NUTS kernel vs the
1-leapfrog-per-tick kernel: eight_schools d=10, shared ChEES warm state,
fresh keys per rep + host-fetch barrier + latency correction (CLAUDE.md
bench protocol). Reports us/leapfrog-slot and completed-trajectories/s
for each (trajectories/s is the schedule-fair metric: paired mode spends
~6-9% of slots idle by design and buys back ~35% op count)."""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import numpy as np


def main(n_chains=65536, ticks=8000, reps=3):
    import jax
    import jax.numpy as jnp
    from gen_tpu import choicemap, select
    from gen_tpu.inference.chees import chees_hmc_warmup_and_sample
    from gen_tpu.inference.target import FlatTarget
    from gen_tpu.ops.nuts_fused import nuts_chains_fused_chunked
    from bench_hard_targets import eight_schools, YS_8, SIGMAS_8

    sig = jnp.asarray(SIGMAS_8, jnp.float32)
    obs = choicemap(ys=jnp.asarray(YS_8, jnp.float32))
    key = jax.random.PRNGKey(0)
    k_init, k_warm, key = jax.random.split(key, 3)
    traces, _ = jax.vmap(lambda k: eight_schools.generate(
        k, (sig,), obs))(jax.random.split(k_init, n_chains))
    sel = select("mu", "log_tau", "theta_std")
    one = jax.tree_util.tree_map(lambda x: x[0], traces)
    target = FlatTarget(one, sel)
    _, warm, winfo = jax.jit(lambda t, k: chees_hmc_warmup_and_sample(
        k, t, sel, num_warmup=400, num_samples=1))(traces, k_warm)
    eps = float(winfo["step_size"])
    inv_mass = winfo["inv_mass"]
    print(f"warm: eps={eps:.3f}")

    # latency floor
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(warm[:8]))
    lat = (time.time() - t0) / 5
    print(f"tiny-call latency {lat * 1e3:.1f} ms")

    for paired in (False, True):
        kw = dict(eps=eps, max_depth=8, inv_mass_diag=inv_mass,
                  collect_idx=0, paired=paired)
        key, kc = jax.random.split(key)
        # compile + warm
        v, h, hc, cnt, st = nuts_chains_fused_chunked(
            kc, target.logp, warm, num_ticks=ticks, **kw)
        float(jnp.sum(v))
        del h, hc
        times, trajs = [], []
        calls = 6
        for r in range(reps):
            key, kr = jax.random.split(key)
            t0 = time.time()
            vv, tot = warm, 0.0
            for c in range(calls):
                vv, h, hc, cnt, st = nuts_chains_fused_chunked(
                    jax.random.fold_in(kr, c), target.logp, vv,
                    num_ticks=ticks, **kw)
                del h, hc
            cs = float(jnp.sum(cnt))     # ONE host fetch for the chain
            times.append(time.time() - t0 - lat)
            trajs.append(cs * calls)     # approx: counts per call similar
        el = float(np.median(times))
        us_slot = el / (ticks * calls) * 1e6
        tps = np.median(trajs) / el
        print(f"paired={paired}: {us_slot:.1f} us/slot "
              f"({ticks} slots, {el * 1e3:.0f} ms), "
              f"traj/s {tps / 1e6:.2f}M, mean_depth "
              f"{float(jnp.mean(st['mean_depth'])):.2f}, "
              f"mean count {float(jnp.mean(cnt.astype(jnp.float32))):.0f}")


if __name__ == "__main__":
    main()
