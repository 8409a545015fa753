"""FSM-NUTS: targets exact Gaussian posteriors (moments to MC tolerance),
matches nuts_flat's trajectory statistics on the same target, never idles
(every tick is one leapfrog), and handles the funnel without NaNs."""

import jax
import jax.numpy as jnp
import numpy as np

from gen_tpu.inference import nuts_fsm
from gen_tpu.inference.nuts import nuts_flat


def run_chains(value_and_grad, dim, eps, n_chains, n_ticks, seed=0,
               slots=256, max_depth=8, theta0=None):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    if theta0 is None:
        theta0 = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                   (n_chains, dim))
    f = jax.jit(jax.vmap(lambda k, t: nuts_fsm(
        k, value_and_grad, t, eps, n_ticks, max_depth=max_depth,
        num_sample_slots=slots)))
    return f(keys, theta0)


def gather_samples(res, burn=5):
    """(m, chains, dim) — first m=min(count) ring samples per chain."""
    counts = np.asarray(res.counts)
    m = int(counts.min())
    assert m > burn, counts.min()
    return np.asarray(res.slots)[:, burn:m, :].swapaxes(0, 1)


def test_standard_normal_moments():
    vag = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x ** 2))
    res = run_chains(vag, 3, 0.5, 256, 1000)
    xs = gather_samples(res)                      # (m, chains, 3)
    n_eff = xs.shape[0] * xs.shape[1]
    assert np.abs(xs.mean(axis=(0, 1))).max() < 6 / np.sqrt(n_eff) + 0.02
    # exactness: this tolerance CAUGHT a real detailed-balance bug (the
    # U-turn checkpoint used the pre-block boundary momentum; var came out
    # 0.90) — do not loosen it
    np.testing.assert_allclose(xs.var(axis=(0, 1)), 1.0, rtol=0.06)
    assert 0.6 < float(res.mean_accept.mean()) <= 1.0
    assert int(res.num_divergent.sum()) == 0


def test_correlated_gaussian_covariance():
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    vag = jax.value_and_grad(lambda x: -0.5 * x @ prec @ x)
    res = run_chains(vag, 2, 0.4, 64, 800, seed=2)
    xs = gather_samples(res).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(xs.T), cov, atol=0.12)


def test_matches_nuts_flat_distribution():
    """Same target, same step size: FSM and while-loop NUTS must agree in
    distribution (variance of samples and mean trajectory depth)."""
    scales = jnp.asarray([0.3, 1.0, 3.0])
    vag = jax.value_and_grad(lambda x: -0.5 * jnp.sum((x / scales) ** 2))
    eps = 0.25

    res = run_chains(vag, 3, eps, 64, 1200, seed=3)
    xs_fsm = gather_samples(res)

    def flat_chain(key, theta0):
        def step(t, k):
            t, stats = nuts_flat(k, vag, t, eps, max_depth=8)
            return t, (t, stats.depth)
        return jax.lax.scan(step, theta0,
                            jax.random.split(key, 60))

    keys = jax.random.split(jax.random.PRNGKey(9), 64)
    t0 = jax.random.normal(jax.random.PRNGKey(10), (64, 3))
    _, (xs_flat, depths) = jax.jit(jax.vmap(flat_chain))(keys, t0)
    xs_flat = np.asarray(xs_flat)[:, 10:, :].reshape(-1, 3)

    v_fsm = xs_fsm.reshape(-1, 3).var(axis=0)
    v_flat = xs_flat.var(axis=0)
    np.testing.assert_allclose(v_fsm, np.asarray(scales) ** 2, rtol=0.2)
    np.testing.assert_allclose(v_flat, np.asarray(scales) ** 2, rtol=0.2)
    # mean trajectory depth within 1 of each other
    assert abs(float(res.mean_depth.mean())
               - float(np.asarray(depths, dtype=float).mean())) < 1.0


def test_every_tick_is_one_leapfrog():
    """Tick accounting: with T ticks, the total leapfrogs per chain is
    exactly T, so completed trajectories x mean(2^depth-ish) ~ T; at the
    least, counts must differ across chains (no lockstep) and sum of
    per-trajectory leaves cannot exceed T."""
    vag = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x ** 2))
    res = run_chains(vag, 3, 0.3, 32, 300, seed=4)
    counts = np.asarray(res.counts)
    assert counts.min() >= 1
    assert len(np.unique(counts)) > 1  # chains advance independently
    # each trajectory costs at least 1 tick
    assert counts.max() <= 300


def test_funnel_no_nans():
    def logp(x):
        v, z = x[0], x[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(z ** 2) * jnp.exp(-v) - 2 * v)
    vag = jax.value_and_grad(logp)
    res = run_chains(vag, 4, 0.1, 16, 400, seed=5)
    assert np.all(np.isfinite(np.asarray(res.theta)))
    assert np.all(np.isfinite(np.asarray(res.slots)))


def test_warmup_pipeline_recovers_conjugate_posterior():
    from gen_tpu.inference import nuts_fsm_warmup_and_sample
    # anisotropic Gaussian (400,000x variance spread): warmup must adapt
    # step size AND mass or the sampler can't move in all directions
    scales = jnp.asarray([0.05, 1.0, 20.0])
    vag = jax.value_and_grad(lambda x: -0.5 * jnp.sum((x / scales) ** 2))
    keys = jax.random.split(jax.random.PRNGKey(11), 64)
    t0 = jax.random.normal(jax.random.PRNGKey(12), (64, 3)) * scales
    res, info = jax.jit(jax.vmap(lambda k, t: nuts_fsm_warmup_and_sample(
        k, vag, t, num_warmup_ticks=1536, num_ticks=1024,
        max_depth=8)))(keys, t0)
    counts = np.asarray(res.counts)
    assert np.median(counts) > 50          # adapted chains move freely
    # pool the valid ring slots across chains (stragglers keep few)
    slots = np.asarray(res.slots)          # (chains, B, 3)
    valid = (np.arange(slots.shape[1])[None, :]
             < np.minimum(counts, slots.shape[1])[:, None])
    xs = slots[valid]                      # (total_valid, 3)
    assert xs.shape[0] > 3000
    np.testing.assert_allclose(xs.var(axis=0), np.asarray(scales) ** 2,
                               rtol=0.3)
    # adapted mass must span the scale range (within ~10x per direction)
    inv_mass = np.exp(np.log(np.asarray(info["inv_mass_diag"])).mean(0))
    ratio = inv_mass / np.asarray(scales) ** 2
    assert ratio.max() / ratio.min() < 300.0, inv_mass
    assert 0.5 < float(res.mean_accept.mean()) <= 1.0


def test_slots_are_prefix_not_ring():
    """Regression (review finding): once the sample buffer fills, later
    samples are dropped — a wrapping ring would rotate each chain's
    sequence by counts % B and corrupt autocorrelation diagnostics."""
    vag = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x ** 2))
    key = jax.random.PRNGKey(6)
    theta0 = jnp.zeros(2)
    small = nuts_fsm(key, vag, theta0, 0.5, 600, max_depth=6,
                     num_sample_slots=8)
    assert int(small.counts) > 8          # buffer definitely filled
    big = nuts_fsm(key, vag, theta0, 0.5, 600, max_depth=6,
                   num_sample_slots=256)
    # identical rng stream => the first 8 samples must match exactly
    np.testing.assert_array_equal(np.asarray(small.slots),
                                  np.asarray(big.slots[:8]))
