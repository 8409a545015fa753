"""Minimal split/merge involutive MCMC example.

Reference: /root/reference/examples/involutive_mcmc/
involution_mh_minimal_example.jl — a model that is either one normal
("merged") or two ("split"), with an involution that splits a value into
two (using an auxiliary u) or merges two into their mean, including the
reversible-jump Jacobian (computed automatically by jacfwd here).

Run: python examples/involutive_mcmc.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import mh_involutive, mh_selection, transform


@gen
def model():
    is_split = gt.bernoulli(0.5) @ "is_split"
    if is_split:
        gt.normal(0.0, 1.0) @ "x1"
        gt.normal(0.0, 1.0) @ "x2"
    else:
        gt.normal(0.0, 1.0) @ "x"


@gen
def split_merge_proposal(tr):
    # auxiliary randomness only for the split direction; the merge
    # direction's u is determined by the involution (dimension matching:
    # merged (x, u) <-> split (x1, x2))
    if not tr["is_split"]:
        gt.uniform(-0.5, 0.5) @ "u"


@transform
def split_merge(ctx):
    is_split = bool(ctx.model_in.discrete["is_split"])
    if not is_split:
        # split: x -> (x + u, x - u); reverse u' recovered from the halves
        x = ctx.model_in["x"]
        u = ctx.aux_in["u"]
        ctx.model_out.discrete["is_split"] = True
        ctx.model_out["x1"] = x + u
        ctx.model_out["x2"] = x - u
        # no continuous aux written back... must stay square: the reverse
        # (merge) reads (x1, x2) [2 reads] and writes (x, u') [2 writes]
        # while split reads (x, u) [2] and writes (x1, x2) [2] — square.
    else:
        x1 = ctx.model_in["x1"]
        x2 = ctx.model_in["x2"]
        ctx.model_out.discrete["is_split"] = False
        ctx.model_out["x"] = (x1 + x2) / 2.0
        ctx.aux_out["u"] = (x1 - x2) / 2.0


def main(n_steps=4000, seed=0):
    key = jax.random.PRNGKey(seed)
    trace, _ = model.generate(key, (), choicemap(is_split=False, x=0.3))
    n_split = 0
    xs = []
    for i in range(n_steps):
        key, k1, k2 = jax.random.split(key, 3)
        trace, _ = mh_involutive(k1, trace, split_merge_proposal, (),
                                 split_merge, check=(i < 3))
        sel = select("x1", "x2") if bool(trace["is_split"]) else select("x")
        trace, _ = mh_selection(k2, trace, sel)
        n_split += int(bool(trace["is_split"]))
        if not bool(trace["is_split"]):
            xs.append(float(trace["x"]))
    frac = n_split / n_steps
    print(f"fraction of time in split state: {frac:.2%} (prior: 50%)")
    print(f"merged-state x moments: mean={np.mean(xs):.3f} (0), "
          f"std={np.std(xs):.3f} (1)")
    assert 0.35 < frac < 0.65, frac
    assert abs(np.mean(xs)) < 0.1 and abs(np.std(xs) - 1.0) < 0.1
    print("involutive_mcmc example OK")


if __name__ == "__main__":
    main()
