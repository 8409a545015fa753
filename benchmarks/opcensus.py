"""Detailed per-primitive op census of the fused NUTS tick body —
which primitives, at which plane sizes, dominate the 54% select tax
(VERDICT r4 item 2 evidence tool)."""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "benchmarks")
from roofline import _find_pallas_eqns, _loops, _while_trip_count, CALLS


def census(jaxpr, counts, loop_scale=1):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "while":
            census(eqn.params["body_jaxpr"].jaxpr, counts,
                   loop_scale * _while_trip_count(eqn))
            continue
        if name == "scan":
            census(eqn.params["jaxpr"].jaxpr, counts,
                   loop_scale * eqn.params["length"])
            continue
        if name in CALLS + ("cond",):
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if k in eqn.params:
                    inner = eqn.params[k]
                    census(getattr(inner, "jaxpr", inner), counts,
                           loop_scale)
                    break
            continue
        sz = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
        counts[(name, sz)] += loop_scale
    return counts


def main(d=10, max_depth=8, tile=1024):
    from gen_tpu.ops.nuts_fused import nuts_chains_fused

    def trivial(x):
        return -0.5 * jnp.sum(x * x)

    ticks = 2
    rng = np.random.default_rng(0)
    inj = (rng.standard_normal((ticks, tile, d)).astype(np.float32),
           rng.random((ticks, tile)).astype(np.float32),
           rng.random((ticks, tile)).astype(np.float32),
           rng.random((ticks, tile)).astype(np.float32),
           rng.random((ticks, tile)).astype(np.float32))
    vals = jnp.zeros((tile, d), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: nuts_chains_fused(
        jax.random.PRNGKey(0), trivial, v, num_ticks=ticks, eps=0.1,
        max_depth=max_depth, injected_rng=inj, interpret=True))(vals)
    eqn = _find_pallas_eqns(jaxpr.jaxpr)[0]
    body, trip = _loops(eqn.params["jaxpr"])[0]
    counts = census(body, defaultdict(float))
    dplane = d * 8 * (tile // 8)
    splane = 8 * (tile // 8)
    rows = sorted(counts.items(), key=lambda kv: -kv[0][1] * kv[1])
    tot = 0.0
    print(f"d={d} md={max_depth} tile={tile}  (dplane={dplane} "
          f"splane={splane})")
    for (name, sz), n in rows:
        kind = ("dplane" if sz == dplane else
                "splane" if sz == splane else str(sz))
        units = sz * n / tile
        tot += units
        print(f"{name:28s} {kind:>8s} x{int(n):4d}  "
              f"-> {units:8.1f} per-chain units")
    print(f"TOTAL per-chain units/tick: {tot:.1f}")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=10)
    p.add_argument("--md", type=int, default=8)
    a = p.parse_args()
    main(a.d, a.md)
