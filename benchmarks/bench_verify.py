"""Validator for bench.py's headline number.

Runs the exact bench pipeline (teleport warmup + pure-MH sampling) and then
checks, against an EXACT reference computed by quadrature:

  p(slope, intercept, log_noise | ys) for the bench model factorizes as
  p(beta | ln, ys) p(ln | ys) with p(beta | ln, ys) Gaussian in closed form
  and p(ln | ys) proportional to prior(ln) * N(ys; 0, s^2 I + X D X^T)
  (beta marginalized analytically), so the marginal slope/intercept/
  log_noise means and sds are a 1-D integral over a log_noise grid.

Asserted: cross-chain posterior moments match quadrature, rank-normalized
split-R-hat < 1.01 on a chain subsample, and the ESS arithmetic bench.py
reports. This is the check that CAUGHT the stuck-chain bug: 18% of 524k
prior-initialized chains sat beyond the leapfrog stability limit
(low-noise tail) and rejected forever — per-chain autocorrelation ESS
looked perfect while the cross-chain slope sd was 1.2 instead of 0.04.
Per-chain diagnostics cannot see unconverged-but-locally-mixing chains;
only cross-chain moments/R-hat can.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B


def exact_posterior_moments(X, ys, prior_beta_sd=2.0, prior_ln_sd=1.0,
                            grid=np.linspace(-3.0, 3.0, 4001)):
    """Exact (slope, intercept, log_noise) posterior means/sds by quadrature
    over log_noise with beta integrated analytically."""
    X = np.asarray(X, np.float64)
    ys = np.asarray(ys, np.float64)
    n, p = X.shape
    D = (prior_beta_sd ** 2) * np.eye(p)
    logw = np.empty(grid.shape)
    mus = np.empty((grid.size, p))
    sigs = np.empty((grid.size, p, p))
    for i, ln in enumerate(grid):
        s2 = np.exp(2.0 * ln)
        C = s2 * np.eye(n) + X @ D @ X.T
        sign, logdet = np.linalg.slogdet(C)
        logw[i] = (-0.5 * logdet - 0.5 * ys @ np.linalg.solve(C, ys)
                   - 0.5 * (ln / prior_ln_sd) ** 2)
        P = X.T @ X / s2 + np.linalg.inv(D)
        S = np.linalg.inv(P)
        mus[i] = S @ (X.T @ ys) / s2
        sigs[i] = S
    w = np.exp(logw - logw.max())
    w /= w.sum()
    mean_beta = w @ mus
    e2 = w @ (np.stack([np.diag(s) for s in sigs]) + mus ** 2)
    sd_beta = np.sqrt(e2 - mean_beta ** 2)
    mean_ln = w @ grid
    sd_ln = np.sqrt(w @ grid ** 2 - mean_ln ** 2)
    return mean_beta, sd_beta, mean_ln, sd_ln


def main(smoke=False):
    """``smoke=True`` shrinks every size for a CPU API-drift check
    (tests/test_benchmarks.py): statistics gates are skipped, the point is
    that every call in the pipeline still composes."""
    import gen_tpu as gt
    from gen_tpu import gen, choicemap, select
    from gen_tpu.inference import hmc_chains
    from gen_tpu.inference.target import FlatTarget

    n_points = 50
    xs = jnp.linspace(-3.0, 3.0, n_points)
    rng = np.random.default_rng(0)
    true_ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(
        rng.standard_normal(n_points))
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)

    mean_beta, sd_beta, mean_ln, sd_ln = exact_posterior_moments(X, true_ys)
    print("exact slope     mean/sd:", mean_beta[0], sd_beta[0])
    print("exact intercept mean/sd:", mean_beta[1], sd_beta[1])
    print("exact log_noise mean/sd:", mean_ln, sd_ln)

    @gen
    def regression_model(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        beta = jnp.stack([slope, intercept])
        gt.normal_linear(X, beta, jnp.exp(log_noise)) @ "ys"
        return slope

    obs = choicemap(ys=true_ys)
    sel = select("slope", "intercept", "log_noise")
    n_chains = 1024 if smoke else 524288
    L, eps = 10, 0.035

    key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_chains)

    @jax.jit
    def init(keys):
        traces, _ = jax.vmap(
            lambda k: regression_model.generate(k, (X,), obs))(keys)
        return jax.vmap(
            lambda tr: tr.get_choices().filter(sel).to_array())(traces)

    one_trace, _ = regression_model.generate(jax.random.PRNGKey(1), (X,), obs)
    target = FlatTarget(one_trace, sel)
    paths = [p for p, _ in one_trace.get_choices().filter(sel).leaf_items()]
    print("layout:", paths)

    i_slope = paths.index(("slope",))

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def run(values, key, n_steps, teleport):
        values, slopes, accs = hmc_chains(
            key, target, values, n_steps=n_steps, L=L, eps=eps,
            collect=lambda v: v[:, i_slope], teleport_after=teleport)
        return values, slopes, accs, jnp.sum(values)

    values = init(init_keys)
    values, _, _, cs = run(values, jax.random.fold_in(k_run, 0),
                           10 if smoke else 100, 5 if smoke else 10)
    float(cs)

    # timed phase mirrors bench.py: the fused Pallas kernel with the
    # scalarized assess-logp (ops/hmc_fused.py + ops/scalarize.py)
    from gen_tpu.ops.hmc_fused import hmc_chains_fused
    n_timed = 10 if smoke else 500

    def run_fused(values, key):
        return hmc_chains_fused(key, target.logp, values, n_steps=n_timed,
                                L=L, eps=eps, collect_idx=i_slope)

    values, s0, _ = run_fused(values, jax.random.fold_in(k_run, 2))
    float(jnp.sum(s0[-1]))

    t0 = time.time()
    values, hist, accs = run_fused(values, jax.random.fold_in(k_run, 1))
    float(jnp.sum(hist[-1]))
    elapsed = time.time() - t0
    print(f"elapsed: {elapsed*1e3:.1f} ms for {n_timed} steps "
          f"({elapsed*1e6/n_timed:.0f} us/step)")
    print("accept:", float(jnp.mean(accs)) / n_timed)

    # cross-chain moments of the final state vs quadrature
    vv = np.asarray(values)
    names = {("slope",): (mean_beta[0], sd_beta[0]),
             ("intercept",): (mean_beta[1], sd_beta[1]),
             ("log_noise",): (mean_ln, sd_ln)}
    ok = True
    for i, pth in enumerate(paths):
        m_ex, s_ex = names[pth]
        m, s = vv[:, i].mean(), vv[:, i].std()
        line = (f"{pth[0]:<10} mean {m:+.5f} (exact {m_ex:+.5f})  "
                f"sd {s:.5f} (exact {s_ex:.5f})")
        good = abs(m - m_ex) < 0.03 * s_ex and abs(s / s_ex - 1) < 0.03
        ok &= good
        print(line, "OK" if good else "FAIL")

    # split-R-hat needs longer chains than the 100-step timed run (at 100
    # draws the between-chain estimator's own noise is ~1.02): a separate
    # 8192-chain x 500-step validation run, same kernel settings
    from gen_tpu.diagnostics import summarize
    val0 = init(jax.random.split(jax.random.fold_in(k_init, 1),
                                 256 if smoke else 8192))
    n_val = 50 if smoke else 500

    @jax.jit
    def run_val(values, key):
        k_w, k_s = jax.random.split(key)
        values, _, _ = hmc_chains(k_w, target, values,
                                  n_steps=10 if smoke else 100, L=L,
                                  eps=eps, collect=lambda v: 0.0,
                                  teleport_after=5 if smoke else 10)
        return hmc_chains(k_s, target, values, n_steps=n_val, L=L, eps=eps)

    _, hist_val, _ = run_val(val0, jax.random.fold_in(k_run, 3))
    hv = np.asarray(hist_val)                    # (n_val, chains, d)
    summ = summarize({p[0]: jnp.asarray(hv[:, :, i])
                      for i, p in enumerate(paths)})
    for name, st in summ.items():
        rh = float(st["rhat"])
        print(f"rhat[{name}] = {rh:.4f}", "OK" if rh < 1.01 else "FAIL")
        ok &= rh < 1.01

    ess = B.autocorr_ess(np.asarray(hist))
    print(f"total ESS: {ess/1e6:.2f}M of {hist.shape[0]*n_chains/1e6:.2f}M "
          f"draws (ESS/draw {ess/(hist.shape[0]*n_chains):.3f})")
    print(f"ESS/s: {ess/elapsed/1e6:.1f}M")
    if smoke:
        print("SMOKE RUN COMPLETE (statistics gates not evaluated)")
        return 0
    print("ALL CHECKS PASS" if ok else "CHECKS FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(smoke="--smoke" in sys.argv))
