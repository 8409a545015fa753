"""Fused Pallas HMC (ops/hmc_fused.py): layout plumbing + XLA-fallback
posterior recovery on CPU; kernel exactness runs TPU-only (the on-core
PRNG has no CPU lowering), mirrored by benchmarks/bench_verify.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference.target import FlatTarget
from gen_tpu.ops.hmc_fused import hmc_chains_fused, _to_planes, _from_planes

KEY = jax.random.PRNGKey(0)


def test_plane_layout_roundtrip():
    v = jnp.arange(5 * 3, dtype=jnp.float32).reshape(5, 3)
    planes, n_pad = _to_planes(v, 16)
    assert planes.shape == (3, 8, 2) and n_pad == 16
    np.testing.assert_allclose(_from_planes(planes, 5), v)
    # padding rows are copies of chain 0 (finite logp guaranteed)
    flat = planes.reshape(3, -1).T
    np.testing.assert_allclose(flat[5:], jnp.broadcast_to(v[0], (11, 3)))


def test_fallback_gaussian_exactness():
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    vals0 = jax.random.normal(KEY, (64, 2)) * 3.0
    vals, coll, accs = hmc_chains_fused(
        jax.random.PRNGKey(1), logp, vals0, n_steps=500, L=5, eps=0.5,
        collect_idx=1, use_pallas=False)
    assert vals.shape == (64, 2)
    assert coll.shape == (500, 64)
    assert accs.shape == (64,)
    s = np.asarray(coll)[100:]
    assert abs(s.mean()) < 0.05
    assert abs(s.std() - 1.0) < 0.05
    assert float(np.mean(np.asarray(accs))) / 500 > 0.8


def test_fallback_matches_flat_target_model():
    """The fused entry point accepts FlatTarget.logp of a real model and
    recovers the exact conjugate posterior (fallback path; the kernel path
    runs the same staged logp on TPU)."""
    n = 40
    sigma = 0.5
    rng = np.random.default_rng(0)
    xs = jnp.linspace(-2.0, 2.0, n)
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)
    beta_true = np.array([0.7, -0.4])
    ys = jnp.asarray(X @ beta_true + sigma * rng.standard_normal(n))

    @gen
    def m(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        gt.normal_linear(X, jnp.stack([slope, intercept]), sigma) @ "ys"

    obs = choicemap(ys=ys)
    sel = select("slope", "intercept")
    one, _ = m.generate(KEY, (X,), obs)
    target = FlatTarget(one, sel)
    P = np.asarray(X.T @ X) / sigma ** 2 + np.eye(2) / 4.0
    Sig = np.linalg.inv(P)
    mu = Sig @ (np.asarray(X.T @ ys) / sigma ** 2)

    vals0 = mu[None, :] + 0.3 * np.asarray(
        jax.random.normal(KEY, (128, 2)))
    vals, coll, accs = hmc_chains_fused(
        jax.random.PRNGKey(2), target.logp, jnp.asarray(vals0),
        n_steps=400, L=8, eps=0.05, use_pallas=False)
    paths = [p for p, _ in one.get_choices().filter(sel).leaf_items()]
    i_s, i_i = paths.index(("slope",)), paths.index(("intercept",))
    vv = np.asarray(vals)
    est = np.array([vv[:, i_s].mean(), vv[:, i_i].mean()])
    np.testing.assert_allclose(
        est, mu,
        atol=float(4 * np.sqrt(np.diag(Sig).max()) / np.sqrt(128) + 2e-3))
    sd = np.array([vv[:, i_s].std(), vv[:, i_i].std()])
    np.testing.assert_allclose(sd, np.sqrt(np.diag(Sig)), rtol=0.3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas TPU kernel needs real TPU")
def test_pallas_kernel_gaussian_exactness():
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    vals0 = jax.random.normal(KEY, (4096, 2)) * 2.0
    vals, coll, accs = hmc_chains_fused(
        jax.random.PRNGKey(1), logp, vals0, n_steps=400, L=5, eps=0.5,
        use_pallas=True)
    s = np.asarray(coll)[100:]
    assert abs(s.mean()) < 0.02
    assert abs(s.std() - 1.0) < 0.02


def test_scalarize_matches_logp_and_grad():
    """stage_scalarized: plane evaluation of the full assess-logp matches
    per-chain evaluation exactly, and the data-only subgraph partial-
    evaluates down to a handful of residual scalars."""
    from gen_tpu.ops.scalarize import stage_scalarized

    n = 50
    xs = jnp.linspace(-3.0, 3.0, n)
    rng = np.random.default_rng(0)
    ys = 0.7 * xs - 0.4 + 0.5 * jnp.asarray(rng.standard_normal(n))
    X = jnp.stack([xs, jnp.ones_like(xs)], axis=1)

    @gen
    def m(X):
        slope = gt.normal(0.0, 2.0) @ "slope"
        intercept = gt.normal(0.0, 2.0) @ "intercept"
        log_noise = gt.normal(0.0, 1.0) @ "log_noise"
        gt.normal_linear(X, jnp.stack([slope, intercept]),
                         jnp.exp(log_noise)) @ "ys"

    one, _ = m.generate(KEY, (X,), choicemap(ys=ys))
    target = FlatTarget(one, select("slope", "intercept", "log_noise"))
    plane_fn, res = stage_scalarized(target.logp, 3)
    # the 50-point dataset must NOT survive into the kernel
    assert res.shape[0] < 32

    V = jnp.asarray(np.random.default_rng(9).standard_normal((3, 8, 16)),
                    jnp.float32)
    res_list = [res[i] for i in range(res.shape[0])]
    lp = plane_fn(V, res_list)
    assert lp.shape == (8, 16)
    f = lambda vv: plane_fn(vv, res_list)
    lpv, pb = jax.vjp(f, V)
    g = pb(jnp.ones_like(lpv))[0]
    for i in range(8):
        for j in range(0, 16, 5):
            ref = float(target.logp(V[:, i, j]))
            np.testing.assert_allclose(float(lp[i, j]), ref,
                                       rtol=5e-4, atol=1e-3)
            gref = np.asarray(jax.grad(target.logp)(V[:, i, j]))
            np.testing.assert_allclose(np.asarray(g[:, i, j]), gref,
                                       rtol=5e-3, atol=5e-3)


def test_scalarize_rejects_data_dependent_residual():
    """A likelihood whose x-dependent part touches the raw data must refuse
    scalarization with actionable advice (the XLA path)."""
    from gen_tpu.ops.scalarize import stage_scalarized
    data = jnp.asarray(np.random.default_rng(0).standard_normal(5000),
                       jnp.float32)

    def logp(x):
        # per-point student-t likelihood: no sufficient statistics, the
        # residual would need all 5000 points inside the kernel
        z = (data - x[0]) / jnp.exp(x[1])
        return jnp.sum(-jnp.log1p(z * z)) - x[1] * 5000

    with pytest.raises(ValueError, match="use the XLA path"):
        stage_scalarized(logp, 2)


def test_fallback_mass_matrix():
    """Diagonal mass: a badly scaled Gaussian (sd 1 and sd 30) mixes when
    inv_mass ~ posterior variance; the kernel and fallback share the
    parameterization (momenta ~ N(0, M), kinetic p^T M^-1 p / 2)."""
    sds = jnp.array([1.0, 30.0])

    def logp(x):
        return -0.5 * jnp.sum((x / sds) ** 2)

    vals0 = jax.random.normal(KEY, (128, 2)) * sds
    vals, coll, accs = hmc_chains_fused(
        jax.random.PRNGKey(3), logp, vals0, n_steps=400, L=8, eps=0.7,
        collect_idx=None, inv_mass_diag=sds ** 2, use_pallas=False)
    s = np.asarray(coll)[100:]
    assert float(np.mean(np.asarray(accs))) / 400 > 0.6
    np.testing.assert_allclose(s[..., 0].std(), 1.0, rtol=0.1)
    np.testing.assert_allclose(s[..., 1].std(), 30.0, rtol=0.1)
