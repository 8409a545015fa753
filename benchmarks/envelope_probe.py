"""Re-measure the fused kernels' dimension/VMEM envelope after the
round-4 layout changes (packed bf16x2 checkpoints, de-unrolled mass
planes) — the numbers here calibrate
``ops/hmc_fused.py::state_plane_bytes``.

Each (kernel, d, max_depth) config runs in its OWN subprocess under a
timeout: a Mosaic scoped-vmem abort or a pathological compile must not
kill the sweep. Results stream as JSON lines.

Usage (remote TPU):
    python benchmarks/envelope_probe.py            # run the sweep
    python benchmarks/envelope_probe.py --one nuts 96 8   # single config
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

CONFIGS = [
    # (kernel, d, max_depth) — post vmem_limit_bytes raise (100 MiB):
    # the state model predicts hmc ~12 d-planes (d<=~2000) and nuts
    # (21+md) d-planes (md8: d<=~800)
    ("hmc", 512, 0), ("hmc", 1024, 0), ("hmc", 1536, 0), ("hmc", 2048, 0),
    ("nuts", 128, 8), ("nuts", 256, 8), ("nuts", 384, 8), ("nuts", 512, 8),
    ("nuts", 640, 8), ("nuts", 768, 8),
    ("nuts", 256, 6), ("nuts", 512, 6),
]
TIMEOUT = 600


def run_one(kernel, d, max_depth):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gen_tpu.ops import hmc_fused as hf
    # bypass the (stale, pre-recalibration) envelope estimator: the point
    # is to find the TRUE hardware boundary
    hf.check_vmem_envelope = lambda *a, **k: 0
    import gen_tpu.ops.nuts_fused as nf

    def logp(x):
        return -0.5 * jnp.sum(x * x)

    n = 1024
    vals0 = jax.random.normal(jax.random.PRNGKey(0), (n, d)) * 1.0
    t0 = time.time()
    if kernel == "hmc":
        out = hf.hmc_chains_fused(jax.random.PRNGKey(1), logp, vals0,
                                  n_steps=8, L=4, eps=0.3, collect_idx=0,
                                  use_pallas=True)
    else:
        out = nf.nuts_chains_fused(jax.random.PRNGKey(1), logp, vals0,
                                   num_ticks=8, eps=0.3,
                                   max_depth=max_depth, collect_idx=0,
                                   use_pallas=True)
    # host fetch = the only honest barrier through the axon tunnel
    chk = float(np.sum(np.asarray(out[0])))
    compile_s = time.time() - t0
    assert np.isfinite(chk)
    return dict(ok=True, compile_s=round(compile_s, 1))


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        kernel, d, md = sys.argv[i + 1], int(sys.argv[i + 2]), int(
            sys.argv[i + 3])
        try:
            res = run_one(kernel, d, md)
        except Exception as e:
            res = dict(ok=False, err=f"{type(e).__name__}: "
                       + str(e).split(chr(10))[0][:300])
        print("RESULT " + json.dumps(dict(kernel=kernel, d=d,
                                          max_depth=md, **res)))
        return

    results = []
    for kernel, d, md in CONFIGS:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", kernel, str(d),
                 str(md)],
                capture_output=True, text=True, timeout=TIMEOUT)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if line:
                rec = json.loads(line[-1][7:])
            else:
                tail = (p.stdout + p.stderr)[-400:].replace(chr(10), " | ")
                rec = dict(kernel=kernel, d=d, max_depth=md, ok=False,
                           err="no-result rc=%s %s" % (p.returncode, tail))
        except subprocess.TimeoutExpired:
            rec = dict(kernel=kernel, d=d, max_depth=md, ok=False,
                       err=f"TIMEOUT >{TIMEOUT}s (compile blowup)")
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print("SUMMARY")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
