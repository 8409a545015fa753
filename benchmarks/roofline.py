"""Roofline / MFU analysis of the fused Pallas kernels (VERDICT r3 item 6).

Turns "8,710x vs baseline" into "X% of chip peak": counts the EXACT
per-tick VPU work of the real kernels (by walking the pallas_call jaxpr,
loop bodies counted once and scaled by their trip counts), measures the
achievable elementwise peaks of this chip with microkernels (FMA,
transcendental, HBM copy), times the production configs, and reports
achieved FLOP/s as a fraction of both the measured FMA peak and the
elementwise op throughput.

Why a VPU roofline (not MXU): the fused samplers are pure elementwise —
no matmuls ride the MXU (the staged models collapse their data reductions
OUTSIDE the kernel), so the relevant ceiling is the vector unit, and the
relevant memory system is VMEM (the chain block never leaves it; HBM
traffic is one collected row per tick = 4-8 bytes/chain/tick, giving
arithmetic intensities of hundreds of FLOP/byte — deep in the
compute-bound regime).

Op accounting (per jaxpr eqn, elementwise size = out.size):
- flops:    arithmetic (add/sub/mul/div/min/max/...) + transcendentals
- transc:   exp/log/sqrt/sin/cos/... (subset of flops; multi-cycle on VPU)
- vpu_ops:  flops + compares/selects/bitwise/integer ops (same issue
            slots as adds, zero "FLOPs" — the honest denominator for
            utilization is ops, the conventional numerator is flops)
- layout ops (broadcast/reshape/slice/get/swap/...) are free-ish and
  uncounted; PRNG bits are not in the trace (counts use the injected-rng
  kernel twin) and are reported as planes/tick instead.

Usage (remote TPU for --peaks/--measure; CPU fine for --count):
    python benchmarks/roofline.py --count
    python benchmarks/roofline.py --peaks
    python benchmarks/roofline.py --measure
    python benchmarks/roofline.py --all
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

SUB, LANE = 8, 128

ARITH = {"add", "sub", "mul", "div", "max", "min", "add_any", "neg",
         "abs", "sign", "floor", "ceil", "round", "rem", "nextafter",
         "atan2", "pow", "integer_pow", "square", "logaddexp"}
TRANSC = {"exp", "log", "sqrt", "rsqrt", "sin", "cos", "tan", "tanh",
          "logistic", "log1p", "expm1", "erf", "erfc", "erf_inv", "cbrt",
          "exp2", "log2"}
PRED = {"lt", "le", "gt", "ge", "eq", "ne", "select_n", "and", "or",
        "xor", "not", "is_finite", "shift_left", "shift_right_logical",
        "shift_right_arithmetic", "clamp", "sort", "reduce_and",
        "reduce_or", "convert_element_type", "bitcast_convert_type"}
FREE = {"broadcast_in_dim", "reshape", "slice", "squeeze", "pad", "get",
        "swap", "iota", "transpose", "concatenate", "copy",
        "dynamic_slice", "dynamic_update_slice", "stop_gradient",
        "masked_swap", "masked_load", "program_id", "num_programs"}
CALLS = ("jit", "pjit", "closed_call", "core_call", "custom_vjp_call",
         "custom_jvp_call", "remat", "checkpoint")


def _size(aval):
    try:
        return int(np.prod(aval.shape)) if aval.shape else 1
    except Exception:
        return 1


def count_jaxpr(jaxpr, counts=None, loop_scale=1):
    """Walk a (pallas kernel) jaxpr, scaling loop bodies by trip count.

    fori_loop appears as `while`: trip count is recovered from the cond
    jaxpr's `lt i N` literal when N is a compile-time constant (true for
    both kernels' step/leapfrog loops); scan uses params['length']."""
    if counts is None:
        counts = dict(flops=0, transc=0, pred=0, vpu_ops=0, other={})
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "while":
            body = eqn.params["body_jaxpr"].jaxpr
            trip = _while_trip_count(eqn)
            count_jaxpr(body, counts, loop_scale * trip)
            continue
        if name == "scan":
            count_jaxpr(eqn.params["jaxpr"].jaxpr, counts,
                        loop_scale * eqn.params["length"])
            continue
        if name in CALLS + ("cond",):
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if k in eqn.params:
                    inner = eqn.params[k]
                    count_jaxpr(getattr(inner, "jaxpr", inner), counts,
                                loop_scale)
                    break
            else:
                if "branches" in eqn.params:
                    # count the worst branch (they run predicated)
                    subs = [count_jaxpr(b.jaxpr, None, 1)
                            for b in eqn.params["branches"]]
                    worst = max(subs, key=lambda c: c["vpu_ops"])
                    for k in ("flops", "transc", "pred", "vpu_ops"):
                        counts[k] += loop_scale * worst[k]
            continue
        sz = sum(_size(v.aval) for v in eqn.outvars)
        if name == "dot_general":
            a, b = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            ((lc, rc), _) = eqn.params["dimension_numbers"]
            k = int(np.prod([a[i] for i in lc])) or 1
            counts["flops"] += loop_scale * 2 * _size(eqn.outvars[0].aval) * k
            counts["vpu_ops"] += loop_scale * 2 * _size(
                eqn.outvars[0].aval) * k
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod", "argmax", "argmin", "cumsum",
                      "cumlogsumexp"):
            n_in = sum(_size(v.aval) for v in eqn.invars)
            counts["flops"] += loop_scale * n_in
            counts["vpu_ops"] += loop_scale * n_in
        elif name in ARITH:
            counts["flops"] += loop_scale * sz
            counts["vpu_ops"] += loop_scale * sz
        elif name in TRANSC:
            counts["flops"] += loop_scale * sz
            counts["transc"] += loop_scale * sz
            counts["vpu_ops"] += loop_scale * sz
        elif name in PRED:
            counts["pred"] += loop_scale * sz
            counts["vpu_ops"] += loop_scale * sz
        elif name in FREE:
            pass
        else:
            counts["other"][name] = counts["other"].get(name, 0) \
                + loop_scale * sz
    return counts


def _while_trip_count(eqn):
    """Recover the static trip count of a fori_loop-style while eqn."""
    cond = eqn.params["cond_jaxpr"]
    # fori cond is  lt(i, N)  with N a constvar literal or carried const
    for ce in cond.jaxpr.eqns:
        if ce.primitive.name == "lt":
            hi = ce.invars[1]
            from jax._src.core import Literal
            if isinstance(hi, Literal):
                return int(hi.val)
            # N rides in as a cond const: match it among the consts
            if hi in cond.jaxpr.constvars:
                return int(cond.consts[cond.jaxpr.constvars.index(hi)])
            # N is a cond invar bound to a literal at the call site:
            # while invars = [cond_consts, body_consts, carry]; cond
            # invars = [cond_consts, carry]
            idx = list(cond.jaxpr.invars).index(hi)
            cn = eqn.params.get("cond_nconsts", 0)
            bn = eqn.params.get("body_nconsts", 0)
            outer = eqn.invars[idx if idx < cn else bn + idx]
            if isinstance(outer, Literal):
                return int(outer.val)
    raise ValueError("cannot recover while trip count (not a fori?)")


def _loops(jaxpr):
    """All (body_jaxpr, trip_count) loop eqns at this level, descending
    through call primitives (jit/pjit) but NOT into loop bodies."""
    out = []
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            out.append((eqn.params["jaxpr"].jaxpr,
                        int(eqn.params["length"])))
        elif name == "while":
            out.append((eqn.params["body_jaxpr"].jaxpr,
                        _while_trip_count(eqn)))
        elif name in CALLS:
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if k in eqn.params:
                    inner = eqn.params[k]
                    out.extend(_loops(getattr(inner, "jaxpr", inner)))
                    break
    return out


def _find_pallas_eqns(jaxpr, found=None):
    if found is None:
        found = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            found.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "eqns"):
                _find_pallas_eqns(v, found)
            elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                _find_pallas_eqns(v.jaxpr, found)
    return found


# ---------------------------------------------------------------------------
# part B: exact op counts of the production kernels (CPU-safe)
# ---------------------------------------------------------------------------

def _bench_regression_logp():
    import jax
    import jax.numpy as jnp
    import gen_tpu as gt
    from gen_tpu import gen, choicemap, select
    from gen_tpu.inference.target import FlatTarget

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
    return FlatTarget(tr, select("slope", "intercept", "log_noise")).logp, 3


def _schools_logp(m):
    import jax
    import jax.numpy as jnp
    from gen_tpu import choicemap, select
    from gen_tpu.inference.target import FlatTarget
    from bench_hard_targets import eight_schools, make_schools, YS_8, SIGMAS_8
    if m == 8:
        ys, sig = np.asarray(YS_8), np.asarray(SIGMAS_8)
    else:
        ys, sig = make_schools(m, seed=0)
    tr, _ = eight_schools.generate(
        jax.random.PRNGKey(1), (jnp.asarray(sig, jnp.float32),),
        choicemap(ys=jnp.asarray(ys, jnp.float32)))
    return (FlatTarget(tr, select("mu", "log_tau", "theta_std")).logp,
            m + 2)


def count_hmc(logp, d, L=10, tile=1024):
    """(per_leapfrog, per_step_extra, init) op counts PER CHAIN."""
    import jax
    import jax.numpy as jnp
    from gen_tpu.ops.hmc_fused import hmc_chains_fused
    n_steps = 2
    rng = np.random.default_rng(0)
    inj = (np.full((n_steps,), 0.1, np.float32),
           rng.standard_normal((n_steps, tile, d)).astype(np.float32),
           rng.random((n_steps, tile)).astype(np.float32))
    vals = jnp.zeros((tile, d), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: hmc_chains_fused(
        jax.random.PRNGKey(0), logp, v, n_steps=n_steps, L=L, eps=0.1,
        injected_rng=inj, interpret=True))(vals)
    eqn = _find_pallas_eqns(jaxpr.jaxpr)[0]
    kj = eqn.params["jaxpr"]
    # two-level structure: outer loop(n_steps) { ... inner loop(L) }
    body, trip = _loops(kj)[0]
    assert trip == n_steps, (trip, n_steps)
    inner_body, inner_trip = _loops(body)[0]
    assert inner_trip == L, (inner_trip, L)
    leap = count_jaxpr(inner_body)
    step_all = count_jaxpr(body)          # includes L leapfrogs
    total = count_jaxpr(kj)
    per = lambda c: {k: c[k] / tile for k in ("flops", "transc", "pred",
                                              "vpu_ops")}
    leap_c, step_c, tot_c = per(leap), per(step_all), per(total)
    step_extra = {k: step_c[k] - L * leap_c[k] for k in leap_c}
    init = {k: tot_c[k] - n_steps * step_c[k] for k in leap_c}
    other = {k: v / tile for k, v in total["other"].items()}
    return leap_c, step_extra, init, other


def count_nuts(logp, d, max_depth=8, tile=1024, paired=False):
    """Per-tick op counts PER CHAIN for the fused FSM-NUTS kernel.
    ``paired=True`` counts the round-5 pair-scheduled kernel and reports
    PER-LEAPFROG-SLOT numbers (the pair tick is divided by 2), so the
    unpaired/paired rows are directly comparable."""
    import jax
    import jax.numpy as jnp
    from gen_tpu.ops.nuts_fused import nuts_chains_fused
    ticks = 2
    rng = np.random.default_rng(0)
    n_u = 7 if paired else 4
    inj = (rng.standard_normal((ticks, tile, d)).astype(np.float32),
           *[rng.random((ticks, tile)).astype(np.float32)
             for _ in range(n_u)])
    vals = jnp.zeros((tile, d), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: nuts_chains_fused(
        jax.random.PRNGKey(0), logp, v,
        num_ticks=2 * ticks if paired else ticks, eps=0.1,
        max_depth=max_depth, injected_rng=inj, interpret=True,
        paired=paired))(vals)
    eqn = _find_pallas_eqns(jaxpr.jaxpr)[0]
    kj = eqn.params["jaxpr"]
    body, trip = _loops(kj)[0]
    assert trip == ticks, (trip, ticks)
    tick = count_jaxpr(body)
    if paired:
        # one pair tick = two leapfrog slots
        tick = {k: (v / 2 if not isinstance(v, dict)
                    else {kk: vv / 2 for kk, vv in v.items()})
                for k, v in tick.items()}
    total = count_jaxpr(kj)
    per = lambda c: {k: c[k] / tile for k in ("flops", "transc", "pred",
                                              "vpu_ops")}
    tick_c, tot_c = per(tick), per(total)
    init = {k: tot_c[k] - ticks * tick_c[k] for k in tick_c}
    other = {k: v / tile for k, v in total["other"].items()}
    return tick_c, init, other


def run_count():
    out = {}
    logp_reg, d_reg = _bench_regression_logp()
    leap, extra, init, other = count_hmc(logp_reg, d_reg, L=10)
    out["hmc_regression_d3"] = dict(per_leapfrog=leap,
                                    per_step_extra=extra, init=init,
                                    uncounted=other)
    logp8, d8 = _schools_logp(8)
    tick, initn, othern = count_nuts(logp8, d8, max_depth=8)
    out["nuts_schools8_d10"] = dict(per_tick=tick, init=initn,
                                    uncounted=othern)
    tickp, initp, otherp = count_nuts(logp8, d8, max_depth=8, paired=True)
    out["nuts_schools8_d10_paired"] = dict(per_leapfrog_slot=tickp,
                                           init=initp, uncounted=otherp)
    logp100, d100 = _schools_logp(100)
    tick1, init1, other1 = count_nuts(logp100, d100, max_depth=8)
    out["nuts_schools100_d102"] = dict(per_tick=tick1, init=init1,
                                       uncounted=other1)

    def trivial(x):
        import jax.numpy as jnp
        return -0.5 * jnp.sum(x * x)
    tickt, _, _ = count_nuts(trivial, 10, max_depth=8)
    out["nuts_trivial_d10"] = dict(per_tick=tickt)
    leapt, extrat, _, _ = count_hmc(trivial, 3, L=10)
    out["hmc_trivial_d3"] = dict(per_leapfrog=leapt, per_step_extra=extrat)
    print(json.dumps(out, indent=1))
    return out


# ---------------------------------------------------------------------------
# part A: measured chip peaks (run on the real TPU)
# ---------------------------------------------------------------------------

def _timeit(fn, reps=3):
    """Median wall time; fresh op per rep + host fetch barrier (the axon
    tunnel memoizes identical calls and block_until_ready lies)."""
    ts = []
    for r in range(reps):
        t0 = time.time()
        chk = fn(r)
        float(np.asarray(chk).ravel()[0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def run_peaks():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # P planes = P independent FMA dependency chains (vregs) so the
    # measurement is issue-bound, not latency-bound; K x G sized so the
    # compute is ~100x the ~25 ms tunnel round-trip latency, which is
    # also measured and subtracted.
    P, K, G = 16, 8192, 1024        # planes, iters, grid programs
    shape = (P, SUB, LANE)

    tinyf = jax.jit(lambda s: s * jnp.float32(1.0001))
    float(np.asarray(tinyf(jnp.float32(1.0))))
    lat = _timeit(lambda r: tinyf(jnp.float32(r + 2.0)), reps=5)
    print(f"tunnel latency: {lat * 1e3:.1f} ms", flush=True)

    def fma_kernel(s_ref, x_ref, o_ref):
        a = s_ref[0]
        b = s_ref[1]

        def body(_, x):
            return x * a + b
        o_ref[0] = jax.lax.fori_loop(0, K, body, x_ref[...])

    def transc_kernel(s_ref, x_ref, o_ref):
        a = s_ref[0]

        def body(_, x):
            return jnp.exp(x * a)          # 1 exp + 1 mul per elem
        o_ref[0] = jax.lax.fori_loop(0, K, body, x_ref[...])

    def make(kernel):
        return pl.pallas_call(
            kernel, grid=(G,),
            out_shape=jax.ShapeDtypeStruct((G,) + shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM))

    x0 = jax.random.normal(jax.random.PRNGKey(0), shape) * 0.1

    fma = jax.jit(lambda s, x: jnp.sum(make(fma_kernel)(s, x)))
    tr = jax.jit(lambda s, x: jnp.sum(make(transc_kernel)(s, x)))

    # fma: a just under 1 keeps x bounded; fresh scalar per rep beats the
    # tunnel memoizer
    t_fma = _timeit(lambda r: fma(
        jnp.asarray([0.999993 + r * 1e-9, 1e-7], jnp.float32), x0),
        reps=5) - lat
    elems = G * P * SUB * LANE * K
    fma_flops = 2 * elems / t_fma

    t_tr = _timeit(lambda r: tr(
        jnp.asarray([-0.43 - r * 1e-9, 0.0], jnp.float32),
        jnp.abs(x0) + 0.5), reps=5) - lat
    exps = elems / t_tr

    # HBM copy bandwidth: 16 chained 1-GiB read+write passes per call
    # (fori keeps them as separate HBM sweeps) so compute >> latency;
    # DISTINCT input array per rep (the tunnel memoizes identical calls)
    big = 1 << 28                       # 2^28 f32 = 1 GiB
    SWEEPS = 16
    bw_fn = jax.jit(lambda a: jax.lax.fori_loop(
        0, SWEEPS, lambda _, x: x * jnp.float32(1.0000001), a))
    mk = jax.jit(lambda s: jnp.full((big,), s))
    bases = [mk(jnp.float32(0.5 + r * 1e-6)) for r in range(5)]
    for b in bases:
        float(np.asarray(b[:1])[0])

    def bw_rep(r):
        return bw_fn(bases[r % len(bases)])[1237]
    t_bw = _timeit(bw_rep, reps=5) - lat
    bw = 2 * big * 4 * SWEEPS / t_bw

    res = dict(fma_peak_flops=fma_flops, exp_per_sec=exps,
               hbm_copy_bytes_per_sec=bw, tunnel_latency_s=lat,
               note=f"P={P} K={K} G={G}; fma counts 2 flops/elem; "
                    "latency-corrected")
    print(json.dumps({k: (f"{v:.3e}" if isinstance(v, float) else v)
                      for k, v in res.items()}, indent=1))
    return res


# ---------------------------------------------------------------------------
# part C: measured production-config throughput (run on the real TPU)
# ---------------------------------------------------------------------------

def run_measure(n_chains=131072, reps=3):
    """Production-config timings, latency-corrected: the tunnel adds
    ~25 ms per synchronized call, so runs are sized (chunked drivers,
    1-2k ticks) to make compute 10-30x that, and the measured tiny-call
    latency is subtracted once per rep."""
    import jax
    import jax.numpy as jnp
    from gen_tpu.ops.hmc_fused import hmc_chains_fused_chunked
    from gen_tpu.ops.nuts_fused import nuts_chains_fused_chunked

    tinyf = jax.jit(lambda s: s * jnp.float32(1.0001))
    float(np.asarray(tinyf(jnp.float32(1.0))))
    lat = _timeit(lambda r: tinyf(jnp.float32(r + 2.0)), reps=5)
    print(f"tunnel latency: {lat * 1e3:.1f} ms", flush=True)

    out = {}

    def time_hmc(tag, logp, d, L, n_steps=2048, nc=n_chains):
        vals = jax.random.normal(jax.random.PRNGKey(0), (nc, d)) * 0.3

        def rep(r):
            _, col, _ = hmc_chains_fused_chunked(
                jax.random.fold_in(jax.random.PRNGKey(7), r), logp, vals,
                n_steps=n_steps, L=L, eps=0.05, collect_idx=0)
            return jnp.sum(col[-1])
        rep(99)                          # compile
        t = _timeit(rep, reps=reps) - lat
        out[tag] = dict(us_per_step=t / n_steps * 1e6, L=L,
                        n_chains=nc, n_steps=n_steps)
        print(tag, json.dumps(out[tag]), flush=True)

    def time_nuts(tag, logp, d, num_ticks=2048, max_depth=8,
                  chunk_ticks=None, nc=n_chains):
        vals = jax.random.normal(jax.random.PRNGKey(0), (nc, d)) * 0.3

        def rep(r):
            _, hist, _, _, _ = nuts_chains_fused_chunked(
                jax.random.fold_in(jax.random.PRNGKey(7), r), logp, vals,
                num_ticks=num_ticks, eps=0.05, max_depth=max_depth,
                collect_idx=0, chunk_ticks=chunk_ticks)
            return jnp.sum(hist[-1])
        rep(99)
        t = _timeit(rep, reps=reps) - lat
        out[tag] = dict(us_per_tick=t / num_ticks * 1e6,
                        n_chains=nc, num_ticks=num_ticks,
                        max_depth=max_depth)
        print(tag, json.dumps(out[tag]), flush=True)

    logp_reg, d_reg = _bench_regression_logp()

    def trivial3(x):
        return -0.5 * jnp.sum(x * x)

    # PRNG + Box-Muller cost in isolation: a kernel that only draws the
    # per-step randomness the HMC step consumes (d normal planes + 2
    # uniform planes) and accumulates it — attributes the per-step
    # overhead the op counter cannot see (injected-rng traces exclude
    # the on-core PRNG).
    def time_prng(tag, d, n_steps=4096, nc=524288):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from gen_tpu.ops.hmc_fused import _normals, _uniform, SUB

        tile = 1024
        tc = tile // SUB

        def kernel(seed_ref, o_ref):
            pid = pl.program_id(0).astype(jnp.uint32)
            pltpu.prng_seed(seed_ref[0],
                            seed_ref[1] ^ (pid * jnp.uint32(0x9E3779B9)))

            def body(_, acc):
                z = _normals(d, (SUB, tc))
                u = _uniform(pltpu.prng_random_bits((SUB, tc)))
                v = _uniform(pltpu.prng_random_bits((SUB, tc)))
                return acc + jnp.sum(z, axis=0) + u + v
            o_ref[...] = jax.lax.fori_loop(
                0, n_steps, body, jnp.zeros((SUB, tc), jnp.float32))

        grid = nc // tile
        f = jax.jit(lambda seed: jnp.sum(pl.pallas_call(
            kernel, grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((SUB, grid * tc), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((SUB, tc), lambda i: (0, i),
                                   memory_space=pltpu.VMEM))(seed)))

        def rep(r):
            return f(jnp.asarray([7, r + 1], jnp.uint32))
        rep(99)
        t = _timeit(rep, reps=reps) - lat
        out[tag] = dict(us_per_step=t / n_steps * 1e6, d=d, n_chains=nc)
        print(tag, json.dumps(out[tag]), flush=True)

    time_prng("prng_d3", 3)
    time_prng("prng_d10", 10, nc=131072)

    # headline chain count for the HMC rows (matches bench.py)
    time_hmc("hmc_reg_d3_L10", logp_reg, d_reg, 10, nc=524288)
    time_hmc("hmc_reg_d3_L1", logp_reg, d_reg, 1, nc=524288)
    time_hmc("hmc_trivial_d3_L10", trivial3, 3, 10, nc=524288)

    logp8, d8 = _schools_logp(8)
    time_nuts("nuts_schools8_d10", logp8, d8)
    time_nuts("nuts_trivial_d10", trivial3, 10)
    logp100, d100 = _schools_logp(100)
    time_nuts("nuts_schools100_d102", logp100, d100, num_ticks=512,
              chunk_ticks=64, nc=32768)
    print(json.dumps(out, indent=1))
    return out


def synthesize(counts, peaks, meas):
    """Assemble the roofline table."""
    rows = []

    def mfu(flops_per_chain_tick, us_per_tick, nc):
        achieved = flops_per_chain_tick * nc / (us_per_tick * 1e-6)
        return achieved, achieved / peaks["fma_peak_flops"]

    h = counts["hmc_regression_d3"]
    per_step = {k: 10 * h["per_leapfrog"][k] + h["per_step_extra"][k]
                for k in h["per_leapfrog"]}
    m = meas["hmc_reg_d3_L10"]
    ach, frac = mfu(per_step["flops"], m["us_per_step"], m["n_chains"])
    rows.append(("hmc_fused regression d=3 L=10", per_step,
                 m["us_per_step"], m["n_chains"], ach, frac))
    for tag, label in (("nuts_schools8_d10",
                        "nuts_fused eight_schools d=10"),
                       ("nuts_schools100_d102",
                        "nuts_fused schools_100 d=102")):
        n = counts[tag]["per_tick"]
        m = meas[tag]
        ach, frac = mfu(n["flops"], m["us_per_tick"], m["n_chains"])
        rows.append((label, n, m["us_per_tick"], m["n_chains"], ach, frac))

    # CONVENTION (ADVICE r4): the last column divides an ops/sec rate by
    # fma_peak_flops, which counts 2 FLOPs per fused-multiply-add issue
    # slot. For op mixes dominated by single-slot selects/compares this
    # UNDER-reports true issue-slot utilization by up to 2x — the column
    # is a conservative lower bound labeled accordingly, not a claim that
    # selects dual-issue.
    print("\n| config | flops/chain/tick | transc | pred/sel | chains | "
          "us/tick | achieved FLOP/s | % FMA peak (flops) | "
          "% of 2x-FMA-FLOP peak (all ops; lower bound on issue util) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, c, t, nc, ach, frac in rows:
        util = (c["vpu_ops"] * nc / (t * 1e-6)) / peaks["fma_peak_flops"]
        print(f"| {name} | {c['flops']:.0f} | {c['transc']:.0f} | "
              f"{c['pred']:.0f} | {nc // 1024}k | {t:.1f} | {ach:.3e} | "
              f"{100 * frac:.1f}% | {100 * util:.1f}% |")
    print("\n(PRNG + Box-Muller excluded from counts — measured "
          "separately: "
          + ", ".join(f"{k}: {meas[k]['us_per_step']:.1f} us/step"
                      for k in ("prng_d3", "prng_d10") if k in meas)
          + ")")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--peaks", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--chains", type=int, default=131072)
    args = ap.parse_args()
    if args.count and not (args.peaks or args.measure or args.all):
        import jax
        jax.config.update("jax_platforms", "cpu")
        run_count()
        return
    counts = peaks = meas = None
    if args.count or args.all:
        counts = run_count()
    if args.peaks or args.all:
        peaks = run_peaks()
    if args.measure or args.all:
        meas = run_measure(n_chains=args.chains)
    if counts and peaks and meas:
        synthesize(counts, peaks, meas)


if __name__ == "__main__":
    main()
