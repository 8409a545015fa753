"""Fused many-chain FSM-NUTS as a single Pallas TPU kernel.

The XLA FSM-NUTS (:mod:`gen_tpu.inference.nuts_fsm`) already fixed the
vmap-lockstep waste — every chain does exactly one real leapfrog per global
tick. What it cannot fix from XLA is the MEMORY traffic: the FSM carries
~`17 + 2*(max_depth+1)` d-vectors of per-chain state (tree endpoints,
candidates, momentum checkpoints) and a scan tick round-trips all of it
through HBM. At 100k+ chains that — not the gradient — is the bottleneck,
exactly the failure mode the fused HMC kernel (ops/hmc_fused.py) solved
for fixed-L trajectories.

This kernel runs the ENTIRE FSM schedule with a block of chains resident
in VMEM: per-tick HBM traffic collapses to one collected row (the
``collect_idx`` coordinate of the current sample). All bookkeeping —
power-of-two momentum checkpoints, block-end U-turn tests, progressive
multinomial candidate selection, biased tree merging, trajectory
completion — is branchless full-tile plane arithmetic on the same
``(d, 8, tile/8)`` layout as the HMC kernel; the only gradient work per
tick is one ``plane_fn`` vjp (the scalarized GFI assess-logp from
ops/scalarize.py).

Tick semantics are IDENTICAL to ``nuts_fsm`` (same iterative multinomial
NUTS as nuts.py, same checkpoint scheme incl. the in-block boundary-
momentum fix); the injected-randomness mode makes that checkable exactly:
tests/test_nuts_fused.py runs this kernel under the Pallas TPU interpreter
on CPU against ``nuts_fsm`` consuming the same host-side randomness.

Reference lineage: the NUTS semantics follow Hoffman & Gelman (2014) as
adopted by the reference's HMC family (inference/hmc.jl:25-73 is its only
dynamic-trajectory-free ancestor); the FSM scheduling and the VMEM-resident
formulation are TPU-native design with no reference analogue.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hmc_fused import SUB, _DEF_TILE, VMEM_LIMIT, _normals, \
    _to_planes, _from_planes, _uniform


def extract_completed_draws(hist, hist_cnt, m: int):
    """(ticks, n[, d]) tick-series + completed-count streams -> (m, n[, d])
    completed draws: draw i of chain j is the series value at the first
    tick where the count reaches i+1 (``hist_cnt`` is nondecreasing per
    chain, so this is a per-chain searchsorted). These draws weight each
    completed trajectory's endpoint exactly once — use THESE for moments;
    the raw tick series is length-biased (inspection paradox)."""
    idx = jax.vmap(lambda col: jnp.searchsorted(col, jnp.arange(1, m + 1)))(
        hist_cnt.T)                                   # (n, m)
    if hist.ndim == 2:
        return jax.vmap(lambda col, ix: col[ix])(hist.T, idx).T
    return jnp.swapaxes(
        jax.vmap(lambda col, ix: col[ix])(jnp.moveaxis(hist, 0, 1), idx),
        0, 1)


def _nuts_chunk_ticks(d, tile, max_depth, per_tick, num_ticks,
                      vmem_budget_bytes):
    """Largest history-chunk tick count that fits next to the live kernel
    state in the scoped-VMEM budget; raises the actionable envelope error
    UP FRONT when even one tick cannot fit (ADVICE r3 — previously a
    64-tick floor pushed the failure into the first in-loop kernel call)."""
    from .hmc_fused import state_plane_bytes
    state_b = state_plane_bytes("nuts", d, tile, max_depth)
    hist_budget = (vmem_budget_bytes - state_b) // 2
    if hist_budget < per_tick:
        raise ValueError(
            f"nuts fused chunking: even a 1-tick history chunk "
            f"({per_tick / 2**20:.2f} MB double-buffered) does not fit "
            f"next to the live kernel state ({state_b / 2**20:.1f} MB, "
            f"d={d}, max_depth={max_depth}) in the "
            f"~{vmem_budget_bytes / 2**20:.0f} MB scoped-VMEM budget; "
            "collect a single coordinate (collect_idx=<int>), lower "
            "max_depth, or use the XLA path (use_pallas=False)")
    return max(1, min(num_ticks, hist_budget // per_tick))


def nuts_chains_fused_chunked(key, logp, values0, num_ticks: int,
                              eps: float, chunk_ticks: Optional[int] = None,
                              vmem_budget_bytes: int = VMEM_LIMIT - (4 << 20), **kw):
    """Drive :func:`nuts_chains_fused` in tick chunks and stitch the
    streams: the kernel's per-tick history lives in a VMEM output block
    (scoped-vmem cap = hmc_fused.VMEM_LIMIT), so long runs must be split. A
    chunk boundary restarts the in-flight trajectory from the current
    sample — a valid transition boundary; only the partial trajectory's
    leapfrogs are discarded. ``hist_counts`` is returned CUMULATIVE across
    chunks, so ``extract_completed_draws`` works on the stitched streams
    unchanged. Stats are count-weighted across chunks."""
    values0 = jnp.asarray(values0, jnp.float32)
    n, d = values0.shape
    ci = kw.get("collect_idx", 0)
    tile = kw.get("tile", _DEF_TILE)
    per_tick = (d + 1 if ci is None else 2) * tile * 4
    if chunk_ticks is None:
        # the history chunk and the kernel's live state share ONE scoped-
        # VMEM budget; the history block is double-buffered (counts 2x,
        # measured — see check_vmem_envelope). Size chunks from what the
        # state leaves over so the envelope check and the chunker agree.
        # NO minimum-tick floor (ADVICE r3): a floor of 64 made every
        # per-chunk kernel call violate its own envelope at mid d with
        # collect_idx=None; small chunks are valid (just more compile/
        # launch overhead), and the truly-impossible case errors here
        # with advice instead of deep inside the chunk loop.
        chunk_ticks = _nuts_chunk_ticks(d, tile, kw.get("max_depth", 8),
                                        per_tick, num_ticks,
                                        vmem_budget_bytes)
    hists, hcnts = [], []
    cnt_total = jnp.zeros((n,), jnp.int32)
    acc_w = jnp.zeros((n,), jnp.float32)
    depth_w = jnp.zeros((n,), jnp.float32)
    div_total = jnp.zeros((n,), jnp.int32)
    values = values0
    done = 0
    last_stats = None
    while done < num_ticks:
        t = min(chunk_ticks, num_ticks - done)
        key, k_use = jax.random.split(key)
        values, hist, hcnt, cnt, stats = nuts_chains_fused(
            k_use, logp, values, num_ticks=t, eps=eps, **kw)
        hists.append(hist)
        hcnts.append(hcnt + cnt_total[None, :])
        cntf = cnt.astype(jnp.float32)
        acc_w = acc_w + stats["mean_accept"] * cntf
        depth_w = depth_w + stats["mean_depth"] * cntf
        div_total = div_total + stats["num_divergent"]
        cnt_total = cnt_total + cnt
        last_stats = stats
        done += t
    denom = jnp.maximum(cnt_total.astype(jnp.float32), 1.0)
    # a chain with zero completed trajectories falls back to the last
    # chunk's in-flight accept statistic, matching nuts_chains_fused /
    # nuts_fsm semantics (their mean_accept does the same where cnt == 0)
    mean_accept = jnp.where(cnt_total > 0, acc_w / denom,
                            last_stats["mean_accept"])
    stats = dict(mean_accept=mean_accept, mean_depth=depth_w / denom,
                 num_divergent=div_total)
    return (values, jnp.concatenate(hists, axis=0),
            jnp.concatenate(hcnts, axis=0), cnt_total, stats)


def nuts_collect_draws(key, logp, values0, num_draws: int, eps: float,
                       max_ticks: Optional[int] = None,
                       chunk_ticks: Optional[int] = None, **kw):
    """Bounded-memory draw collection: drive :func:`nuts_chains_fused` in
    chunks, extract each chunk's COMPLETED draws into a fixed
    ``(num_draws, n[, d])`` buffer, and DISCARD the tick streams — memory
    is O(num_draws * n) regardless of how many ticks the slowest chain
    needs (the stitched-stream driver holds O(total_ticks * n), which
    walls out long diagnostics runs; two separate HBM OOMs this round
    came from exactly that).

    Returns ``(draws, values, counts, ticks_used)``; ``draws[j, i]`` is
    chain i's (j+1)-th completed-trajectory endpoint (coordinate
    ``collect_idx``, or the full vector when ``collect_idx=None``),
    NaN-filled where a chain completed fewer than ``num_draws``
    trajectories within ``max_ticks`` (default ``64 * num_draws``)."""
    values0 = jnp.asarray(values0, jnp.float32)
    n, d = values0.shape
    ci = kw.get("collect_idx", 0)
    tile = kw.get("tile", _DEF_TILE)
    if chunk_ticks is None:
        per_tick = (d + 1 if ci is None else 2) * tile * 4
        chunk_ticks = _nuts_chunk_ticks(d, tile, kw.get("max_depth", 8),
                                        per_tick, 4096, VMEM_LIMIT - (4 << 20))
    if max_ticks is None:
        max_ticks = 64 * num_draws
    targets = jnp.arange(1, num_draws + 1)

    if ci is None:
        draws = jnp.full((num_draws, n, d), jnp.nan, jnp.float32)
    else:
        draws = jnp.full((num_draws, n), jnp.nan, jnp.float32)

    @jax.jit
    def fold_chunk(draws, base, hist, hcnt):
        """Scatter this chunk's completed draws into the buffer."""
        hcnt_abs = hcnt + base[None, :]                # (t, n) cumulative

        def per_chain(col_cnt, base_i, new_i):
            pos = jnp.clip(jnp.searchsorted(col_cnt, targets),
                           0, col_cnt.shape[0] - 1)
            mask = (targets > base_i) & (targets <= new_i)
            return pos, mask

        new_base = base + hcnt[-1]
        pos, mask = jax.vmap(per_chain, in_axes=(1, 0, 0),
                             out_axes=(0, 0))(hcnt_abs, base, new_base)
        # pos/mask: (n, num_draws); gather hist[pos[i, j], i]
        if hist.ndim == 2:
            vals = jnp.take_along_axis(hist.T, pos, axis=1)  # (n, nd)
            draws = jnp.where(mask.T, vals.T, draws)
        else:
            vals = jnp.take_along_axis(
                jnp.moveaxis(hist, 0, 1), pos[:, :, None], axis=1)
            draws = jnp.where(mask.T[:, :, None],
                              jnp.moveaxis(vals, 0, 1), draws)
        return draws, new_base

    base = jnp.zeros((n,), jnp.int32)
    values = values0
    done = 0
    while done < max_ticks:
        t = int(min(chunk_ticks, max_ticks - done))
        key, k_use = jax.random.split(key)
        values, hist, hcnt, cnt, _stats = nuts_chains_fused(
            k_use, logp, values, num_ticks=t, eps=eps, **kw)
        draws, base = fold_chunk(draws, base, hist, hcnt)
        del hist, hcnt
        done += t
        if int(jnp.min(base)) >= num_draws:
            break
    return draws, values, base, done


def _kernel(num_ticks, max_depth, eps, div_threshold, collect_idx, n_res,
            staged, injected, has_stream, *refs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    refs = list(refs)
    v_ref, seed_ref, res_ref, mass_ref = refs[:4]
    refs = refs[4:]
    # SMEM-resident dataset for streamed (non-collapsible) likelihoods
    data_ref = refs.pop(0) if has_stream else None
    if injected:
        (z_ref, u4_ref,
         out_ref, outc_ref, vout_ref, cnt_ref, stat_ref) = refs
    else:
        out_ref, outc_ref, vout_ref, cnt_ref, stat_ref = refs

    res = [res_ref[i] for i in range(n_res)]

    def vag(v):
        # scalar part: ones-cotangent vjp; streamed data terms: gradients
        # hand-assembled by scalarize._stream_loop (never differentiates
        # through the data fori)
        return staged.plane_vag(v, res, data_ref)

    if not injected:
        pid = pl.program_id(0).astype(jnp.uint32)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (pid * jnp.uint32(0x9E3779B9)))

    v0 = v_ref[...]
    d = v0.shape[0]
    plane = v0.shape[1:]
    lp0, g0 = vag(v0)
    # EVERY carried plane must be derived from loaded data, never a splat
    # constant: Mosaic assigns splats a fully-replicated layout, and the
    # fori carry then demands an invalid general->replicated relayout of
    # the loop body's results ("Non-singleton logical dimension is
    # replicated in destination but not in source")
    f0 = v0[0] * 0.0
    i0 = f0.astype(jnp.int32)
    b0 = f0 > 1.0
    zd = v0 * 0.0
    izd = (v0 * 0.0).astype(jnp.int32)     # packed-checkpoint zero plane
    ninf = f0 - jnp.inf
    feps = jnp.float32(eps)

    # inv_mass == 0 freezes a coordinate (infinite mass): its momentum
    # draw is zeroed here, and every other use of momentum flows through
    # inv_m-weighted products (position update, kinetic, U-turn dots),
    # so the coordinate never moves and contributes nothing -- this is
    # how Gibbs-within-NUTS blocks and per-chain conditioning values
    # ride inside the kernel state (see docs/api.md)
    #
    # ROUND-4 de-unroll: the mass enters as SMEM scalars, broadcast ONCE
    # into a loop-invariant (d, 8, tc) plane; every per-coordinate use
    # (momentum scale, position update, U-turn/kinetic dots) is then ONE
    # leading-axis array op instead of a d-way Python unroll — the tick
    # body's jaxpr goes from O(d * max_depth) to O(max_depth) equations,
    # which is what killed the d=80 multi-minute Mosaic compiles.
    from ..utils import sqrt_mass_safe
    inv_plane = jnp.stack([f0 + mass_ref[i] for i in range(d)])
    # NOTE: recomputing the sqrt per tick to drop this loop-invariant
    # plane was tried and made scoped-VMEM WORSE (+1.4 MB at d=128 —
    # Mosaic's peak-liveness allocator charges in-loop temporaries more
    # than an invariant buffer); keep it hoisted
    mom_plane = sqrt_mass_safe(inv_plane)

    def scale_mass(z):
        return mom_plane * z

    def apply_inv_mass(r):
        return inv_plane * r

    def dot_im(a, b):
        return jnp.sum(inv_plane * a * b, axis=0)

    def kinetic(r):
        return 0.5 * dot_im(r, r)

    # bf16x2 checkpoint packing: each live level's (momentum, rho-sum)
    # checkpoint pair lives in ONE int32 plane (round-to-nearest-even
    # bf16 halves, utils.bf16_pack2). Checkpoints feed only the U-turn
    # dot products — a deterministic, reversal-symmetric stopping rule —
    # so the rounding changes when trajectories stop, never the
    # invariant distribution; the XLA reference (nuts_fsm
    # ckpt_bf16=True) rounds with the same bit arithmetic, keeping the
    # interpret-mode tick-exactness tests exact.
    from ..utils import bf16_pack2, bf16_unpack2

    def uturn(rho, r_a, r_b):
        return (dot_im(rho, r_a) <= 0.0) | (dot_im(rho, r_b) <= 0.0)

    def w1(c, a, b):
        return jnp.where(c, a, b)

    def wd(c, a, b):
        return jnp.where(c[None], a, b)

    # state tuple layout (all planes; d-vectors are (d, 8, tc)):
    state = (
        v0, lp0, g0,                       # 0-2  cur theta/logp/grad
        i0,                                # 3    count
        f0,                                # 4    energy0
        v0, zd, g0,                        # 5-7  left theta/r/grad
        v0, zd, g0,                        # 8-10 right theta/r/grad
        zd,                                # 11   rho_tree
        v0, lp0, g0,                       # 12-14 cand theta/logp/grad
        f0,                                # 15   logw_tree
        i0,                                # 16   depth
        f0,                                # 17   alpha_sum
        i0,                                # 18   nlf
        f0 + eps,                          # 19   dir_eps
        i0,                                # 20   sub_n
        # num_leaves as f32 exp2(depth): Mosaic rejects vector-shift
        # amounts (left_shift by a per-lane int plane); 2^depth is exact
        # in f32 for every reachable depth
        f0 + 1.0,                          # 21   num_leaves
        v0, zd, g0,                        # 22-24 pt theta/r/grad
        zd,                                # 25   rho_sub
        v0, lp0, g0,                       # 26-28 cand_sub theta/logp/grad
        ninf,                              # 29   logw_sub
        # 30: packed U-turn checkpoints — ONLY levels 1..max_depth-1 are
        # live (a level-k block can only COMPLETE inside a subtree of
        # >= 2^k leapfrogs, and subtrees have at most 2^(max_depth-1):
        # the level-max_depth ends-test never fires, and slot 0 was never
        # used), each level's (r, rho-sum) pair bf16x2-packed in one
        # int32 plane: 2*(max_depth+1) f32 planes -> (max_depth-1) planes
        tuple(izd for _ in range(max(max_depth - 1, 0))),
        f0, f0, i0,                        # 31-33 accept_sum/depth_sum/div
        # fresh carried as int32 0/1: bool planes in a fori carry fail
        # Mosaic legalization (scf.for with i1 vector carries)
        i0 + 1,                            # 35   fresh
    )

    def tick(t, s):
        (cur_t, cur_lp, cur_g, count, energy0, lt, lr, lg, rt, rr, rg,
         rho_t, ct, clp, cg, lwt, depth, asum, nlf, de, sn, nl,
         ptv, pr, pg, rs, cs, cslp, csg, lws, ck,
         acc_sum, depth_sum, div, fresh_i) = s
        fresh = fresh_i != 0

        if injected:
            z_t = z_ref[t]
            u_dir0 = u4_ref[t, 0]
            u_take = u4_ref[t, 1]
            u_bias = u4_ref[t, 2]
            u_dir = u4_ref[t, 3]
        else:
            z_t = _normals(d, plane)
            u_dir0 = _uniform(pltpu.prng_random_bits(plane))
            u_take = _uniform(pltpu.prng_random_bits(plane))
            u_bias = _uniform(pltpu.prng_random_bits(plane))
            u_dir = _uniform(pltpu.prng_random_bits(plane))
        tiny = jnp.float32(1.1754944e-38)
        u_take = jnp.maximum(u_take, tiny)
        u_bias = jnp.maximum(u_bias, tiny)

        # -- trajectory init (masked): momentum refresh at cur_theta ------
        r0 = scale_mass(z_t)
        dir0 = jnp.where(u_dir0 < 0.5, feps, -feps)
        energy0 = w1(fresh, cur_lp - kinetic(r0), energy0)
        lt = wd(fresh, cur_t, lt)
        lr = wd(fresh, r0, lr)
        lg = wd(fresh, cur_g, lg)
        rt = wd(fresh, cur_t, rt)
        rr = wd(fresh, r0, rr)
        rg = wd(fresh, cur_g, rg)
        rho_t = wd(fresh, r0, rho_t)
        ct = wd(fresh, cur_t, ct)
        clp = w1(fresh, cur_lp, clp)
        cg = wd(fresh, cur_g, cg)
        lwt = w1(fresh, 0.0, lwt)
        depth = w1(fresh, 0, depth)
        asum = w1(fresh, 0.0, asum)
        nlf = w1(fresh, 0, nlf)
        de = w1(fresh, dir0, de)
        sn = w1(fresh, 0, sn)
        nl = w1(fresh, 1.0, nl)
        ptv = wd(fresh, cur_t, ptv)
        pr = wd(fresh, r0, pr)
        pg = wd(fresh, cur_g, pg)
        rs = wd(fresh, zd, rs)
        cs = wd(fresh, cur_t, cs)
        cslp = w1(fresh, cur_lp, cslp)
        csg = wd(fresh, cur_g, csg)
        lws = w1(fresh, -jnp.inf, lws)

        # -- block-start masks (level k live when sn % 2^k == 0) ----------
        rs_pre = rs                       # pre-leapfrog rho_sub: the
        starts_k = []                     # block-start checkpoint value
        for k in range(1, max_depth):
            starts_k.append((sn & jnp.int32(2 ** k - 1)) == 0)

        # -- ONE leapfrog (the only gradient work; never masked out) ------
        r = pr + (0.5 * de)[None] * pg
        theta = ptv + de[None] * apply_inv_mass(r)
        lp, grad = vag(theta)
        r = r + (0.5 * de)[None] * grad

        # momentum checkpoint = the block's first IN-BLOCK (post-leapfrog)
        # state — see nuts_fsm.py / nuts.py for the direction-asymmetry bug
        # the pre-block boundary version causes. Both halves of the pair
        # (post-leapfrog r, block-start rho_sub) are known here, so each
        # level writes ONE packed plane.
        ck = list(ck)
        for k in range(1, max_depth):
            ck[k - 1] = wd(starts_k[k - 1], bf16_pack2(r, rs_pre),
                           ck[k - 1])

        delta = (lp - kinetic(r)) - energy0
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = delta < -jnp.float32(div_threshold)
        asum = asum + jnp.minimum(1.0, jnp.exp(delta))
        nlf = nlf + 1

        # progressive multinomial candidate within the subtree
        lws_new = jnp.logaddexp(lws, delta)
        take = jnp.log(u_take) < delta - lws_new
        cs = wd(take, theta, cs)
        cslp = w1(take, lp, cslp)
        csg = wd(take, grad, csg)
        rs = rs + r
        lws = lws_new

        # block-end U-turn checks inside the subtree (levels above
        # max_depth-1 can never complete a block — no checkpoint, no check)
        turning_sub = b0
        for k in range(1, max_depth):
            ends = ((sn + 1) & jnp.int32(2 ** k - 1)) == 0
            rck_k, rsck_k = bf16_unpack2(ck[k - 1])
            block_rho = rs - rsck_k
            turning_sub = turning_sub | (ends & uturn(block_rho, rck_k, r))

        sub_done = (((sn + 1).astype(jnp.float32) >= nl) | turning_sub
                    | diverging)

        # ---- subtree merge into the tree (masked by sub_done) -----------
        ok = ~turning_sub & ~diverging
        take_tree = (jnp.log(u_bias) < lws - lwt) & ok
        ct = wd(sub_done & take_tree, cs, ct)
        clp = w1(sub_done & take_tree, cslp, clp)
        cg = wd(sub_done & take_tree, csg, cg)
        lwt = w1(sub_done & ok, jnp.logaddexp(lwt, lws), lwt)

        went_right = de > 0
        upd_end = sub_done & ok
        rt = wd(upd_end & went_right, theta, rt)
        rr = wd(upd_end & went_right, r, rr)
        rg = wd(upd_end & went_right, grad, rg)
        lt = wd(upd_end & ~went_right, theta, lt)
        lr = wd(upd_end & ~went_right, r, lr)
        lg = wd(upd_end & ~went_right, grad, lg)
        rho_t = wd(upd_end, rho_t + rs, rho_t)

        turning_tree = uturn(rho_t, lr, rr)
        traj_done = sub_done & (turning_sub | diverging
                                | (ok & turning_tree)
                                | (depth + 1 >= max_depth))

        # ---- next subtree (trajectory continues) ------------------------
        depth_next = depth + jnp.where(sub_done & ~traj_done, 1, 0)
        new_dir = jnp.where(u_dir < 0.5, feps, -feps)
        start_sub = sub_done & ~traj_done
        de = w1(start_sub, new_dir, de)
        go_right = de > 0
        ptv = wd(start_sub, wd(go_right, rt, lt), theta)
        pr = wd(start_sub, wd(go_right, rr, lr), r)
        pg = wd(start_sub, wd(go_right, rg, lg), grad)
        sn = w1(sub_done, 0, sn + 1)
        nl = w1(start_sub, jnp.exp2(depth_next.astype(jnp.float32)), nl)
        rs = wd(start_sub, zd, rs)
        lws = w1(start_sub, -jnp.inf, lws)

        # ---- trajectory finish: emit sample, schedule re-init -----------
        cur_t = wd(traj_done, ct, cur_t)
        cur_lp = w1(traj_done, clp, cur_lp)
        cur_g = wd(traj_done, cg, cur_g)
        count = count + jnp.where(traj_done, 1, 0)
        acc_sum = acc_sum + jnp.where(
            traj_done, asum / jnp.maximum(nlf, 1).astype(jnp.float32), 0.0)
        depth_sum = depth_sum + jnp.where(
            traj_done, depth_next.astype(jnp.float32) + 1.0, 0.0)
        div = div + jnp.where(traj_done & diverging, 1, 0)
        fresh_next = traj_done.astype(jnp.int32)

        if collect_idx is None:
            out_ref[pl.ds(t, 1)] = cur_t[None]
        else:
            out_ref[pl.ds(t, 1)] = cur_t[collect_idx][None]
        outc_ref[pl.ds(t, 1)] = count[None]

        return (cur_t, cur_lp, cur_g, count, energy0, lt, lr, lg, rt, rr,
                rg, rho_t, ct, clp, cg, lwt, depth_next, asum, nlf, de, sn,
                nl,
                ptv, pr, pg, rs, cs, cslp, csg, lws, tuple(ck),
                acc_sum, depth_sum, div, fresh_next)

    s = jax.lax.fori_loop(0, num_ticks, tick, state)
    vout_ref[...] = s[0]
    cnt_ref[...] = s[3]
    # stats planes: accept_sum, depth_sum, div_count, inflight alpha_sum,
    # inflight nlf (mean_accept assembled host-side like nuts_fsm)
    stat_ref[0] = s[31]
    stat_ref[1] = s[32]
    stat_ref[2] = s[33].astype(jnp.float32)
    stat_ref[3] = s[17]
    stat_ref[4] = s[18].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "logp", "num_ticks", "eps", "max_depth", "collect_idx", "tile",
    "divergence_threshold", "use_pallas", "interpret"))
def nuts_chains_fused(key, logp: Callable, values0, num_ticks: int,
                      eps: float, max_depth: int = 8,
                      inv_mass_diag=None, collect_idx: int = 0,
                      tile: int = _DEF_TILE,
                      divergence_threshold: float = 1000.0,
                      use_pallas: Optional[bool] = None,
                      injected_rng=None, interpret: bool = False):
    """Run ``num_ticks`` FSM-NUTS leapfrog ticks on (n_chains, d) values.

    Returns ``(values (n, d), hist (num_ticks, n), hist_counts
    (num_ticks, n) int32, counts (n,), stats)``: ``hist[t, j]`` is
    coordinate ``collect_idx`` of chain j's CURRENT sample after tick t
    (piecewise-constant between trajectory completions — a valid series
    for autocorrelation ESS: plateau lengths encode the trajectory
    costs, but it is length-biased for MOMENTS via the inspection
    paradox); ``hist_counts[t, j]`` is the completed-trajectory count
    after tick t, so ``hist[t]`` at ticks where the count increments
    extracts each completed draw exactly once (unbiased); ``counts`` the
    final completed-trajectory counts; ``stats`` a dict with
    ``mean_accept``/``mean_depth``/``num_divergent`` per chain. ``eps`` is static; ``inv_mass_diag`` may be traced (SMEM
    scalars). Semantics match ``inference.nuts_fsm.nuts_fsm`` tick for
    tick; ``injected_rng=(z (ticks, n, d), u_dir0, u_take, u_bias, u_dir
    each (ticks, n))`` replaces the on-core PRNG for exact comparison, and
    ``interpret=True`` runs the kernel under the Pallas TPU interpreter
    (how CI exercises it on CPU)."""
    if use_pallas is None:
        from .resample import on_tpu
        use_pallas = on_tpu()
    if interpret:
        use_pallas = True
    if injected_rng is not None and not use_pallas:
        raise ValueError("injected_rng requires the Pallas path "
                         "(use_pallas=True or interpret=True)")
    values0 = jnp.asarray(values0, jnp.float32)
    n, d = values0.shape
    inv_mass = (jnp.ones((d,), jnp.float32) if inv_mass_diag is None
                else jnp.asarray(inv_mass_diag, jnp.float32))

    if not use_pallas:
        from ..inference.nuts_fsm import nuts_fsm
        vag = jax.value_and_grad(logp)
        keys = jax.random.split(key, n)
        ci = "all" if collect_idx is None else collect_idx
        res, (hist, hist_cnt) = jax.vmap(
            lambda kk, t: nuts_fsm(kk, vag, t, eps, num_ticks,
                                   max_depth=max_depth,
                                   inv_mass_diag=inv_mass,
                                   num_sample_slots=8,
                                   divergence_threshold=divergence_threshold,
                                   collect_idx=ci,
                                   ckpt_bf16=True))(keys, values0)
        stats = dict(mean_accept=res.mean_accept,
                     mean_depth=res.mean_depth,
                     num_divergent=res.num_divergent)
        return (res.theta, jnp.moveaxis(hist, 0, 1), hist_cnt.T,
                res.counts, stats)

    from .hmc_fused import check_vmem_envelope
    check_vmem_envelope("nuts", d, tile, max_depth=max_depth,
                        # +1: the completed-count stream rides next to the
                        # sample history
                        hist_planes=(d if collect_idx is None else 1) + 1,
                        num_ticks=num_ticks)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes, n_pad = _to_planes(values0, tile)
    tc = tile // SUB
    cols = n_pad // SUB
    grid = cols // tc

    from .scalarize import stage_scalarized
    staged = stage_scalarized(logp, d)
    res_consts = staged.res_consts
    has_stream = staged.stream_data is not None

    seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2]

    in_specs = [pl.BlockSpec((d, SUB, tc), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [planes, seed, res_consts, inv_mass]
    if has_stream:
        # the streamed dataset rides in SMEM next to the residual scalars
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(staged.stream_data)
    if injected_rng is not None:
        z_all, u_dir0, u_take, u_bias, u_dir = injected_rng

        def to_plane_steps(x):
            x = jnp.asarray(x, jnp.float32)
            pad = jnp.concatenate(
                [x, jnp.broadcast_to(x[:, :1], (num_ticks, n_pad - n)
                                     + x.shape[2:])], axis=1) \
                if n_pad != n else x
            if pad.ndim == 3:
                return jnp.moveaxis(pad, 2, 1).reshape(num_ticks, d, SUB,
                                                       cols)
            return pad.reshape(num_ticks, SUB, cols)

        z_p = to_plane_steps(z_all)
        u4 = jnp.stack([to_plane_steps(u) for u in
                        (u_dir0, u_take, u_bias, u_dir)], axis=1)
        in_specs += [pl.BlockSpec((num_ticks, d, SUB, tc),
                                  lambda i: (0, 0, 0, i),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((num_ticks, 4, SUB, tc),
                                  lambda i: (0, 0, 0, i),
                                  memory_space=pltpu.VMEM)]
        inputs += [z_p, u4]

    if collect_idx is None:
        hist_shape = jax.ShapeDtypeStruct((num_ticks, d, SUB, cols),
                                          jnp.float32)
        hist_spec = pl.BlockSpec((num_ticks, d, SUB, tc),
                                 lambda i: (0, 0, 0, i),
                                 memory_space=pltpu.VMEM)
    else:
        hist_shape = jax.ShapeDtypeStruct((num_ticks, SUB, cols),
                                          jnp.float32)
        hist_spec = pl.BlockSpec((num_ticks, SUB, tc), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)

    out, outc, vout, cnt, stat = pl.pallas_call(
        functools.partial(_kernel, num_ticks, int(max_depth), float(eps),
                          float(divergence_threshold),
                          None if collect_idx is None else int(collect_idx),
                          res_consts.shape[0], staged,
                          injected_rng is not None, has_stream),
        grid=(grid,),
        # the input state planes donate their HBM buffer to the
        # final-state output
        input_output_aliases={0: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        out_shape=(hist_shape,
                   jax.ShapeDtypeStruct((num_ticks, SUB, cols), jnp.int32),
                   jax.ShapeDtypeStruct((d, SUB, cols), jnp.float32),
                   jax.ShapeDtypeStruct((SUB, cols), jnp.int32),
                   jax.ShapeDtypeStruct((5, SUB, cols), jnp.float32)),
        in_specs=in_specs,
        out_specs=(hist_spec,
                   pl.BlockSpec((num_ticks, SUB, tc), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((d, SUB, tc), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((SUB, tc), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((5, SUB, tc), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*inputs)

    values = _from_planes(vout, n)
    if collect_idx is None:
        hist = jnp.moveaxis(out.reshape(num_ticks, d, n_pad), 1, 2)[:, :n, :]
    else:
        hist = out.reshape(num_ticks, n_pad)[:, :n]
    hist_cnt = outc.reshape(num_ticks, n_pad)[:, :n]
    counts = cnt.reshape(-1)[:n]
    acc_sum = stat[0].reshape(-1)[:n]
    depth_sum = stat[1].reshape(-1)[:n]
    divs = stat[2].reshape(-1)[:n]
    alpha_infl = stat[3].reshape(-1)[:n]
    nlf_infl = stat[4].reshape(-1)[:n]
    cntf = jnp.maximum(counts, 1).astype(jnp.float32)
    inflight = alpha_infl / jnp.maximum(nlf_infl, 1.0)
    mean_accept = jnp.where(counts > 0, acc_sum / cntf, inflight)
    stats = dict(mean_accept=mean_accept, mean_depth=depth_sum / cntf,
                 num_divergent=divs.astype(jnp.int32))
    return values, hist, hist_cnt, counts, stats
