"""Finite-state-machine NUTS: no lockstep waste across vmapped chains.

`nuts_flat` (nuts.py) is the textbook iterative NUTS: a while_loop over
tree doublings around a while_loop over subtree leapfrogs. Under ``vmap``
each transition runs until the SLOWEST chain's trajectory terminates —
every other chain burns full leapfrog gradients as masked no-ops, and
across a scan of transitions the expected waste is
E[max_chains(len)] / E[len], which grows with the chain count (measured:
NUTS ESS/sec *dropped* from 769k at 4k chains to 507k at 32k,
benchmarks/RESULTS.md). The fix (cf. "Efficiently Vectorized MCMC on
Modern Accelerators", arXiv:2503.17405): flatten the sampler into a state
machine stepped by a global leapfrog "tick". Every chain does exactly one
real leapfrog per tick; bookkeeping (subtree U-turn checkpoints, tree
merging, trajectory completion, momentum refresh) happens branchlessly in
the margins. A chain that finishes its trajectory *emits a sample and
starts the next trajectory on the next tick* — zero idle gradients, and
wall-clock per sample tracks the MEAN trajectory length instead of the
max.

Semantics are the same iterative multinomial NUTS as nuts_flat
(progressive within-subtree sampling, biased tree/subtree sampling,
power-of-two checkpoint U-turn scheme, divergence threshold); only the
scheduling differs. Samples land in a fixed ring of ``num_sample_slots``
per chain via one-hot masked writes (dynamic_update_slice under vmap
lowers to per-element scatters — the 84x trap in CLAUDE.md).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .nuts import _uturn
from ..utils import sqrt_mass_safe


class FSMResult(NamedTuple):
    slots: jnp.ndarray        # (num_sample_slots, dim) FIRST samples, in
                              # order (writes stop once the buffer fills)
    counts: jnp.ndarray       # () int32 — completed trajectories
    theta: jnp.ndarray        # final current sample
    mean_accept: jnp.ndarray  # mean accept-stat over completed trajectories
    mean_depth: jnp.ndarray
    num_divergent: jnp.ndarray
    pos_mean: jnp.ndarray     # (dim,) mean of per-tick leapfrog positions
    pos_var: jnp.ndarray      # (dim,) variance of per-tick positions


def nuts_fsm(key, value_and_grad, theta0, step_size, num_ticks: int,
             max_depth: int = 10, inv_mass_diag=None,
             num_sample_slots: int = 256,
             divergence_threshold: float = 1000.0,
             injected_rng=None, collect_idx=None,
             ckpt_bf16: bool = False) -> FSMResult:
    """Run ``num_ticks`` global leapfrog ticks of FSM-NUTS from ``theta0``.

    One chain; ``vmap`` over (key, theta0[, step_size, inv_mass_diag]) for
    many chains — that is the whole point. Returns the sample buffer (the
    first ``min(counts, num_sample_slots)`` slots are the trajectory-end
    samples in order; later samples are dropped, never wrapped), the final
    position, and stats.

    ``injected_rng``: optional ``(z (ticks, dim), u_dir0, u_take, u_bias,
    u_dir — each (ticks,))`` host-side randomness replacing the per-tick
    PRNG draws — the hook that makes the fused Pallas kernel
    (ops/nuts_fused.py) exactly comparable to this reference.
    ``collect_idx``: if set, additionally returns per-tick
    ``(cur_theta[collect_idx], completed_count)`` as a second output
    (two ``(ticks,)`` arrays — the fused kernel's cheap static-index
    collection streams; the count stream marks trajectory-end ticks so
    each completed draw can be extracted exactly once). The string
    ``"all"`` collects the whole ``(ticks, dim)`` position history.

    ``ckpt_bf16``: round the U-turn checkpoint stores (``r_ckpt``,
    ``rsum_ckpt``) to bf16 via :func:`gen_tpu.utils.bf16_round` — the
    semantics of the fused Pallas kernel, which packs each checkpoint
    pair bf16x2 into one plane to halve its VMEM cost. Checkpoints feed
    only the block-end U-turn dot products (a deterministic,
    trajectory-reversal-symmetric stopping rule), so rounding them
    changes WHEN trajectories stop, never the invariant distribution;
    validated distribution-level in tests/test_nuts_fused.py and
    benchmarks/bench_nuts_fused.py.
    """
    dim = theta0.shape[0]
    dt = theta0.dtype
    inv_mass = (jnp.ones(dim, dtype=dt) if inv_mass_diag is None
                else jnp.asarray(inv_mass_diag, dtype=dt))
    sqrt_mass = sqrt_mass_safe(inv_mass)
    eps = jnp.asarray(step_size, dtype=dt)
    B = num_sample_slots

    def vag(theta):
        # pin to the state dtype: model logps may promote (e.g. f64
        # constants under x64) and a mixed-dtype scan carry won't typecheck
        lp, g = value_and_grad(theta)
        return jnp.asarray(lp, dt), jnp.asarray(g, dt)

    logp0, grad0 = vag(theta0)

    def kinetic(r):
        return 0.5 * jnp.dot(r, inv_mass * r)

    # every state init is DERIVED from theta0 rather than a literal: under
    # shard_map, literal constants are "unvarying" over the manual axis
    # while the tick outputs vary, and the scan carry would not typecheck
    f0 = theta0[0] * 0
    i0 = f0.astype(jnp.int32)
    zeros = theta0 * 0
    state = dict(
        # chain level
        cur_theta=theta0, cur_logp=logp0, cur_grad=grad0,
        count=i0, slots=jnp.zeros((B, dim), dtype=dt) + f0,
        accept_sum=f0, depth_sum=f0, div_count=i0,
        pos_n=f0, pos_mean=zeros, pos_m2=zeros,
        fresh=(i0 == 0), key=key,
        # trajectory level
        energy0=f0,
        left_theta=theta0, left_r=zeros, left_grad=grad0,
        right_theta=theta0, right_r=zeros, right_grad=grad0,
        rho_tree=zeros, cand_theta=theta0, cand_logp=logp0, cand_grad=grad0,
        logw_tree=f0, depth=i0, alpha_sum=f0, nlf=i0,
        # subtree level
        dir_eps=f0 + eps, sub_n=i0, num_leaves=i0 + 1,
        pt_theta=theta0, pt_r=zeros, pt_grad=grad0,
        rho_sub=zeros, cand_sub=theta0, cand_sub_logp=logp0,
        cand_sub_grad=grad0, logw_sub=f0 - jnp.inf,
        r_ckpt=jnp.zeros((max_depth + 1, dim), dtype=dt) + f0,
        rsum_ckpt=jnp.zeros((max_depth + 1, dim), dtype=dt) + f0,
    )

    def sel(c, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(c, x, y), a, b)

    def tick(s, xs):
        if injected_rng is None:
            key, k_mom, k_dir0, k_take, k_bias, k_dir = jax.random.split(
                s["key"], 6)
            z_t = jax.random.normal(k_mom, (dim,), dtype=dt)
            u_dir0 = jax.random.uniform(k_dir0, dtype=dt)
            u_take = jax.random.uniform(k_take, dtype=dt)
            u_bias = jax.random.uniform(k_bias, dtype=dt)
            u_dir = jax.random.uniform(k_dir, dtype=dt)
        else:
            key = s["key"]
            z_t, u_dir0, u_take, u_bias, u_dir = xs
        fresh = s["fresh"]

        # -- trajectory init (masked): momentum refresh at cur_theta ------
        r0 = sqrt_mass * z_t
        dir0 = jnp.where(u_dir0 < 0.5, eps, -eps)
        init = dict(
            energy0=s["cur_logp"] - kinetic(r0),
            left_theta=s["cur_theta"], left_r=r0, left_grad=s["cur_grad"],
            right_theta=s["cur_theta"], right_r=r0,
            right_grad=s["cur_grad"],
            rho_tree=r0, cand_theta=s["cur_theta"],
            cand_logp=s["cur_logp"], cand_grad=s["cur_grad"],
            logw_tree=f0, depth=jnp.int32(0), alpha_sum=f0,
            nlf=jnp.int32(0),
            dir_eps=dir0, sub_n=jnp.int32(0), num_leaves=jnp.int32(1),
            pt_theta=s["cur_theta"], pt_r=r0, pt_grad=s["cur_grad"],
            rho_sub=zeros, cand_sub=s["cur_theta"],
            cand_sub_logp=s["cur_logp"], cand_sub_grad=s["cur_grad"],
            logw_sub=-jnp.inf * jnp.ones((), dt),
        )
        for k_, v_ in init.items():
            s = dict(s, **{k_: sel(fresh, v_, s[k_])})

        n = s["sub_n"]
        # checkpoint store rounding: identity in f32 mode, bf16 (the fused
        # kernel's packed-checkpoint semantics) when ckpt_bf16
        if ckpt_bf16:
            from ..utils import bf16_round
            _ckround = lambda x: bf16_round(x).astype(x.dtype)
        else:
            _ckround = lambda x: x
        # -- block-start rho checkpoints (level k when n % 2^k == 0) ------
        r_ck, rs_ck = s["r_ckpt"], s["rsum_ckpt"]
        for k in range(1, max_depth + 1):
            starts = (n % (2 ** k)) == 0
            rs_ck = rs_ck.at[k].set(jnp.where(starts,
                                              _ckround(s["rho_sub"]),
                                              rs_ck[k]))

        # -- ONE leapfrog (the only gradient work; never masked out) ------
        e = s["dir_eps"]
        r = s["pt_r"] + 0.5 * e * s["pt_grad"]
        theta = s["pt_theta"] + e * (inv_mass * r)
        logp, grad = vag(theta)
        r = r + 0.5 * e * grad

        # momentum checkpoint = the block's first IN-BLOCK state (post-
        # leapfrog) — the pre-block boundary momentum makes the stopping
        # rule direction-asymmetric and biases the sampler (see the
        # matching comment + measurement in nuts.py::build_subtree)
        for k in range(1, max_depth + 1):
            starts = (n % (2 ** k)) == 0
            r_ck = r_ck.at[k].set(jnp.where(starts, _ckround(r), r_ck[k]))

        # Welford over every leapfrog position (dense scale statistics for
        # mass-matrix warmup — completed samples are too sparse when
        # trajectories are long)
        pos_n = s["pos_n"] + 1.0
        d_ = theta - s["pos_mean"]
        pos_mean = s["pos_mean"] + d_ / pos_n
        pos_m2 = s["pos_m2"] + d_ * (theta - pos_mean)

        delta = (logp - kinetic(r)) - s["energy0"]
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = delta < -divergence_threshold
        alpha_sum = s["alpha_sum"] + jnp.minimum(1.0, jnp.exp(delta))
        nlf = s["nlf"] + 1

        # progressive multinomial candidate within the subtree
        logw_sub = jnp.logaddexp(s["logw_sub"], delta)
        take = jnp.log(u_take) < delta - logw_sub
        cand_sub = jnp.where(take, theta, s["cand_sub"])
        cand_sub_logp = jnp.where(take, logp, s["cand_sub_logp"])
        cand_sub_grad = jnp.where(take, grad, s["cand_sub_grad"])
        rho_sub = s["rho_sub"] + r

        # block-end U-turn checks inside the subtree
        turning_sub = jnp.asarray(False)
        for k in range(1, max_depth + 1):
            ends = ((n + 1) % (2 ** k)) == 0
            block_rho = rho_sub - rs_ck[k]
            turning_sub = turning_sub | (
                ends & _uturn(block_rho, r_ck[k], r, inv_mass))

        sub_done = ((n + 1) >= s["num_leaves"]) | turning_sub | diverging

        # ---- subtree merge into the tree (masked by sub_done) -----------
        ok = ~turning_sub & ~diverging
        take_tree = (jnp.log(u_bias) < logw_sub - s["logw_tree"]) & ok
        cand_theta = jnp.where(sub_done & take_tree, cand_sub,
                               s["cand_theta"])
        cand_logp = jnp.where(sub_done & take_tree, cand_sub_logp,
                              s["cand_logp"])
        cand_grad = jnp.where(sub_done & take_tree, cand_sub_grad,
                              s["cand_grad"])
        logw_tree = jnp.where(sub_done & ok,
                              jnp.logaddexp(s["logw_tree"], logw_sub),
                              s["logw_tree"])

        went_right = s["dir_eps"] > 0
        upd_end = sub_done & ok
        right_theta = jnp.where(upd_end & went_right, theta,
                                s["right_theta"])
        right_r = jnp.where(upd_end & went_right, r, s["right_r"])
        right_grad = jnp.where(upd_end & went_right, grad, s["right_grad"])
        left_theta = jnp.where(upd_end & ~went_right, theta,
                               s["left_theta"])
        left_r = jnp.where(upd_end & ~went_right, r, s["left_r"])
        left_grad = jnp.where(upd_end & ~went_right, grad, s["left_grad"])
        rho_tree = jnp.where(upd_end, s["rho_tree"] + rho_sub,
                             s["rho_tree"])

        turning_tree = _uturn(rho_tree, left_r, right_r, inv_mass)
        traj_done = sub_done & (turning_sub | diverging
                                | (ok & turning_tree)
                                | (s["depth"] + 1 >= max_depth))

        # ---- next subtree (trajectory continues) ------------------------
        depth_next = s["depth"] + jnp.where(sub_done & ~traj_done, 1, 0)
        new_dir = jnp.where(u_dir < 0.5, eps, -eps)
        start_sub = sub_done & ~traj_done
        dir_eps = jnp.where(start_sub, new_dir, s["dir_eps"])
        go_right_next = dir_eps > 0
        pt_theta = jnp.where(
            start_sub, jnp.where(go_right_next, right_theta, left_theta),
            theta)
        pt_r = jnp.where(start_sub,
                         jnp.where(go_right_next, right_r, left_r), r)
        pt_grad = jnp.where(start_sub,
                            jnp.where(go_right_next, right_grad, left_grad),
                            grad)
        sub_n = jnp.where(sub_done, 0, n + 1)
        num_leaves = jnp.where(
            start_sub, jnp.left_shift(jnp.int32(1), depth_next),
            s["num_leaves"])
        rho_sub = jnp.where(start_sub, zeros, rho_sub)
        logw_sub = jnp.where(start_sub, -jnp.inf, logw_sub)

        # ---- trajectory finish: emit sample, schedule re-init -----------
        cur_theta = jnp.where(traj_done, cand_theta, s["cur_theta"])
        cur_logp = jnp.where(traj_done, cand_logp, s["cur_logp"])
        cur_grad = jnp.where(traj_done, cand_grad, s["cur_grad"])
        # prefix buffer, NOT a ring: writes stop at B samples. A wrapping
        # ring rotates each chain's sequence by counts % B, silently
        # corrupting downstream autocorrelation/R-hat computed on
        # slots[:m] (each chain rotated differently).
        slot = jnp.minimum(s["count"], B - 1)
        onehot = ((jnp.arange(B) == slot)[:, None] & traj_done
                  & (s["count"] < B))
        slots = jnp.where(onehot, cand_theta[None, :], s["slots"])
        count = s["count"] + jnp.where(traj_done, 1, 0)
        accept_sum = s["accept_sum"] + jnp.where(
            traj_done, alpha_sum / jnp.maximum(nlf, 1), 0.0)
        # nuts_flat counts every doubling incl. the terminating one
        depth_sum = s["depth_sum"] + jnp.where(
            traj_done, depth_next.astype(dt) + 1.0, 0.0)
        div_count = s["div_count"] + jnp.where(traj_done & diverging, 1, 0)

        new_s = dict(
            cur_theta=cur_theta, cur_logp=cur_logp, cur_grad=cur_grad,
            count=count, slots=slots, accept_sum=accept_sum,
            depth_sum=depth_sum, div_count=div_count,
            pos_n=pos_n, pos_mean=pos_mean, pos_m2=pos_m2,
            fresh=traj_done, key=key,
            energy0=s["energy0"],
            left_theta=left_theta, left_r=left_r, left_grad=left_grad,
            right_theta=right_theta, right_r=right_r,
            right_grad=right_grad,
            rho_tree=rho_tree, cand_theta=cand_theta, cand_logp=cand_logp,
            cand_grad=cand_grad, logw_tree=logw_tree, depth=depth_next,
            alpha_sum=alpha_sum, nlf=nlf,
            dir_eps=dir_eps, sub_n=sub_n, num_leaves=num_leaves,
            pt_theta=pt_theta, pt_r=pt_r, pt_grad=pt_grad,
            rho_sub=rho_sub, cand_sub=cand_sub,
            cand_sub_logp=cand_sub_logp, cand_sub_grad=cand_sub_grad,
            logw_sub=logw_sub, r_ckpt=r_ck, rsum_ckpt=rs_ck,
        )
        # (value, completed-count) per tick: the count stream marks which
        # ticks END a trajectory, so downstream can extract each completed
        # draw exactly once — the raw tick series is length-biased (a
        # sample is displayed for its successor trajectory's duration;
        # inspection paradox)
        if collect_idx is None:
            emit = None
        elif collect_idx == "all":
            emit = (cur_theta, count)
        else:
            emit = (cur_theta[collect_idx], count)
        return new_s, emit

    if injected_rng is None:
        out, ticks_hist = jax.lax.scan(tick, state, None, length=num_ticks)
    else:
        z_all, u_dir0_all, u_take_all, u_bias_all, u_dir_all = injected_rng
        out, ticks_hist = jax.lax.scan(
            tick, state,
            (jnp.asarray(z_all, dt), jnp.asarray(u_dir0_all, dt),
             jnp.asarray(u_take_all, dt), jnp.asarray(u_bias_all, dt),
             jnp.asarray(u_dir_all, dt)))
    cnt = jnp.maximum(out["count"], 1)
    # no completed trajectory (short runs / very long trajectories): report
    # the IN-FLIGHT trajectory's accept statistic instead of 0 — a 0 would
    # drive dual-averaging warmup into a shrinking-step death spiral
    inflight = out["alpha_sum"] / jnp.maximum(out["nlf"], 1)
    mean_accept = jnp.where(out["count"] > 0, out["accept_sum"] / cnt,
                            inflight)
    res = FSMResult(slots=out["slots"], counts=out["count"],
                    theta=out["cur_theta"],
                    mean_accept=mean_accept,
                    mean_depth=out["depth_sum"] / cnt,
                    num_divergent=out["div_count"],
                    pos_mean=out["pos_mean"],
                    pos_var=out["pos_m2"] / jnp.maximum(out["pos_n"] - 1,
                                                        1.0))
    if collect_idx is not None:
        return res, ticks_hist
    return res


def nuts_fsm_warmup_and_sample(key, value_and_grad, theta0,
                               num_warmup_ticks: int = 1024,
                               num_ticks: int = 2048,
                               warmup_chunks: int = 16,
                               max_depth: int = 10,
                               target_accept: float = 0.8,
                               adapt_mass: bool = True,
                               num_sample_slots: int = 256,
                               free_mask=None):
    """Full FSM pipeline for one chain (vmap over (key, theta0) for many):
    dual-averaging warmup in ``warmup_chunks`` fixed-tick chunks (one DA
    update per chunk from that chunk's mean accept statistic — chunked
    adaptation, since the FSM has no per-transition boundary across
    chains), diagonal mass from the second half of warmup samples, then a
    sampling run at the adapted (step size, mass). Returns
    (FSMResult, info dict).

    ``free_mask``: optional (dim,) 0/1 mask — coordinates with mask 0 are
    FROZEN (inverse mass pinned to 0 through warmup AND the mass
    adaptation, the shared frozen-coordinate convention of
    utils.sqrt_mass_safe), which is how partial selections condition each
    chain on its own unselected values (sample_posterior engine
    parity with chees/hmc_fused/nuts_fused)."""
    from .nuts import da_init, da_update, find_reasonable_step_size

    dim = theta0.shape[0]
    dt = theta0.dtype
    mask = (jnp.ones(dim, dt) if free_mask is None
            else jnp.asarray(free_mask, dt))
    k_find1, k_w1, k_samp = jax.random.split(key, 3)
    half = max(warmup_chunks // 2, 1)
    chunk_ticks = max(num_warmup_ticks // (3 * half), 1)
    B = num_sample_slots

    def da_stage(k_stage, theta_in, eps0, inv_mass):
        """Chunked dual averaging at fixed mass; returns final theta,
        adapted eps, and the position variance of the LAST chunk."""
        def chunk(carry, k):
            theta, da = carry
            res = nuts_fsm(k, value_and_grad, theta,
                           jnp.exp(da.log_eps), chunk_ticks,
                           max_depth=max_depth, inv_mass_diag=inv_mass,
                           num_sample_slots=B)
            da = da_update(da, res.mean_accept, target_accept)
            return (res.theta, da), res.pos_var

        (theta, da), pos_vars = jax.lax.scan(
            chunk, (theta_in, da_init(eps0)),
            jax.random.split(k_stage, half))
        # scale statistics: mean position variance over the later chunks
        var = jnp.mean(pos_vars[half // 2:], axis=0)
        return theta, jnp.exp(da.log_eps_bar), var

    # Iterated stages: adapt eps under the current mass, re-measure the
    # per-coordinate scales from that stage's (better-mixing) trajectory
    # positions, update the mass, repeat. One stage badly underestimates
    # slow directions (pre-preconditioning trajectories barely traverse
    # them); iterating converges geometrically — measured on a
    # (0.05, 1, 20)-scaled Gaussian the slow-dim mass goes 0.8 -> 80 ->
    # ~300 (true 400) over three stages.
    theta = theta0
    inv_mass = mask
    eps_final = jnp.asarray(0.1, dt)
    for stage in range(3):
        k_find = jax.random.fold_in(k_find1, stage)
        k_stage = jax.random.fold_in(k_w1, stage)
        eps0 = find_reasonable_step_size(k_find, value_and_grad, theta,
                                         inv_mass)
        theta, eps_final, var = da_stage(k_stage, theta, eps0, inv_mass)
        if stage < 2:
            # frozen coordinates stay frozen through adaptation (their
            # position variance is 0 anyway, but the 1e-8 floor would
            # silently unfreeze them)
            inv_mass = jnp.where(jnp.asarray(adapt_mass),
                                 mask * jnp.maximum(var, 1e-8), inv_mass)

    res = nuts_fsm(k_samp, value_and_grad, theta, eps_final, num_ticks,
                   max_depth=max_depth, inv_mass_diag=inv_mass,
                   num_sample_slots=num_sample_slots)
    info = dict(step_size=eps_final, inv_mass_diag=inv_mass,
                mean_accept=res.mean_accept)
    return res, info

