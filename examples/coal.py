"""Coal-mining-style changepoint model with reversible-jump MCMC.

Reference: /root/reference/examples/coal/coal.jl (Green 1995 changepoint
RJMCMC with birth/death involutions).

TPU-native design: the trace is a **fixed-shape arena** — K_MAX changepoint
position slots and K_MAX+1 height slots always exist; ``k`` selects how many
are active, and inactive slots sit at their prior (so every trace has the
same pytree shape and all moves jit). Trans-dimensional birth/death is a
single involution through the transform DSL whose |det J| = T (birth) /
1/T (death) is computed by jacfwd automatically.

Run: python examples/coal.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.dists import exp_of
from gen_tpu.inference import mh_involutive, mh_proposal, mh_selection, transform

K_MAX = 6
T_END = 100.0


@gen
def coal_model(years):
    k = gt.uniform_discrete(0, K_MAX) @ "k"
    positions = gt.uniform(jnp.zeros(K_MAX), T_END) @ "positions"
    heights = gt.gamma(jnp.full(K_MAX + 1, 2.0),
                       jnp.full(K_MAX + 1, 1.0)) @ "heights"
    active = jnp.arange(K_MAX) < k
    bounds = jnp.sort(jnp.where(active, positions, jnp.inf))
    seg = jnp.sum(years[:, None] > bounds[None, :], axis=1)
    rate = heights[seg]
    gt.poisson(rate) @ "counts"
    return k


def make_dataset(seed=1):
    """Two true changepoints at t=30 and t=70 with rates (0.7, 3.0, 1.0)."""
    rng = np.random.default_rng(seed)
    years = np.arange(int(T_END)) + 0.5
    rates = np.where(years < 30, 0.7, np.where(years < 70, 3.0, 1.0))
    counts = rng.poisson(rates)
    return jnp.asarray(years), jnp.asarray(counts)


# -- birth/death involution (RJMCMC) --------------------------------------

@gen
def birth_death_proposal(tr):
    gt.bernoulli(0.5) @ "do_birth"
    gt.uniform(0.0, 1.0) @ "u"


@transform
def birth_death(ctx):
    do_birth = bool(ctx.aux_in.discrete["do_birth"])
    k = int(ctx.model_in.discrete["k"])
    positions = ctx.model_in["positions"]
    u = ctx.aux_in["u"]
    if do_birth and k < K_MAX:
        # activate slot k at position u*T; reverse move is a death whose
        # aux u' recovers the slot value
        new_positions = positions.at[k].set(u * T_END)
        ctx.model_out.discrete["k"] = k + 1
        ctx.model_out["positions"] = new_positions
        ctx.aux_out.discrete["do_birth"] = False
        ctx.aux_out["u"] = positions[k] / T_END
    elif (not do_birth) and k > 0:
        # deactivate slot k-1; record its position as the reverse-birth u
        ctx.model_out.discrete["k"] = k - 1
        ctx.model_out["positions"] = positions.at[k - 1].set(u * T_END)
        ctx.aux_out.discrete["do_birth"] = True
        ctx.aux_out["u"] = positions[k - 1] / T_END
    else:
        # boundary: identity move
        ctx.model_out.discrete["k"] = k
        ctx.model_out["positions"] = positions
        ctx.aux_out.discrete["do_birth"] = not do_birth
        ctx.aux_out["u"] = u


# -- within-dimension moves ------------------------------------------------

@gen
def height_walk(tr):
    """Multiplicative lognormal random walk on all height slots (the @dist
    DSL at work: exp_of(normal) is the lognormal)."""
    cur = tr["heights"]
    exp_of(gt.broadcasted_normal)(jnp.log(cur), 0.25) @ "heights"


@gen
def position_walk(tr):
    cur = tr["positions"]
    gt.broadcasted_normal(cur, 2.0) @ "positions"


def sweep(key, trace):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    trace, _ = mh_involutive(k1, trace, birth_death_proposal, (), birth_death)
    trace, _ = mh_proposal(k2, trace, height_walk)
    trace, _ = mh_proposal(k3, trace, position_walk)
    trace, _ = mh_selection(k4, trace, select("k"))
    return trace


def main(n_sweeps=3000, seed=0):
    years, counts = make_dataset()
    obs = choicemap(counts=counts)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    trace, _ = coal_model.generate(k_init, (years,), obs)

    ks = []
    found_positions = []
    for i in range(n_sweeps):
        key, sub = jax.random.split(key)
        trace = sweep(sub, trace)
        k = int(trace["k"])
        ks.append(k)
        if i > n_sweeps // 3:
            pos = np.sort(np.asarray(trace["positions"])[:k]) if k else []
            found_positions.append(pos)

    burn = n_sweeps // 3
    ks_post = np.asarray(ks[burn:])
    from collections import Counter
    hist = Counter(ks_post.tolist())
    print(f"posterior over k: {dict(sorted(hist.items()))}")
    mode_k = hist.most_common(1)[0][0]
    print(f"posterior mode of k = {mode_k} (true 2)")
    two_cp = [p for p in found_positions if len(p) == 2]
    if two_cp:
        mean_cp = np.mean(np.stack(two_cp), axis=0)
        print(f"mean changepoints (k=2 traces): {mean_cp} (true [30, 70])")
        assert abs(mean_cp[0] - 30) < 12 and abs(mean_cp[1] - 70) < 12, mean_cp
    assert mode_k in (2, 3), hist
    print("coal example OK")


if __name__ == "__main__":
    main()
