"""Geweke joint-distribution tests (Geweke 2004): the marginal-conditional
sampler (forward simulation of p(theta, y)) and the successive-conditional
sampler (alternate an MCMC kernel targeting p(theta | y) with resampling
y ~ p(y | theta)) must produce the SAME joint distribution. Any error in a
regenerate/update/HMC weight anywhere in the stack shifts the successive
sampler's moments — this is the whole-framework analogue of the reference's
per-case weight arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import hmc

KEY = jax.random.PRNGKey(3)


@gen
def joint():
    theta = gt.normal(0.5, 1.2) @ "theta"
    scale = gt.gamma(3.0, 2.0) @ "scale"
    y = gt.normal(theta * 2.0, jnp.sqrt(scale)) @ "y"
    return y


LATENTS = select("theta", "scale")
DATA = select("y")


def _moments(theta, scale, y):
    return jnp.stack([theta.mean(), (theta ** 2).mean(), scale.mean(),
                      y.mean(), (theta * y).mean()])


def _marginal_conditional(key, n):
    trs = jax.vmap(lambda k: joint.simulate(k, ()))(jax.random.split(key, n))
    return trs["theta"], trs["scale"], trs["y"]


def _successive_conditional(key, n_chains, n_steps, use_hmc):
    k_init, k_run = jax.random.split(key)
    traces = jax.vmap(lambda k: joint.simulate(k, ()))(
        jax.random.split(k_init, n_chains))

    def step(trs, sk):
        ks = jax.vmap(lambda i: jax.random.fold_in(sk, i))(
            jnp.arange(n_chains))

        def one(tr, k):
            k1, k2, k3 = jax.random.split(k, 3)
            if use_hmc:
                tr, _ = hmc(k1, tr, LATENTS, L=5, eps=0.15)
            else:
                new, w, _ = joint.regenerate(k1, tr, (), (), LATENTS)
                acc = jnp.log(jax.random.uniform(k3)) < w
                tr = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc, a, b), new, tr)
            # resample the data given the latents (weight is 0 by
            # construction — full conditional — but accept-step anyway
            # to catch weight errors)
            new, w, _ = joint.regenerate(k2, tr, (), (), DATA)
            return new, w

        trs, ws = jax.vmap(one)(trs, ks)
        return trs, (trs["theta"], trs["scale"], trs["y"], ws)

    _, (thetas, scales, ys, ws) = jax.lax.scan(
        step, traces, jax.random.split(k_run, n_steps))
    burn = n_steps // 3
    return (thetas[burn:].reshape(-1), scales[burn:].reshape(-1),
            ys[burn:].reshape(-1), ws)


def _compare(key, use_hmc):
    n = 200_000
    mc = _moments(*_marginal_conditional(jax.random.fold_in(key, 0), n))
    th, sc, y, ws = jax.jit(
        lambda k: _successive_conditional(k, 256, 400, use_hmc))(
            jax.random.fold_in(key, 1))
    scs = _moments(th, sc, y)
    # data-resampling regenerate weight must be exactly 0 (full conditional)
    np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-9)
    # moments agree within a loose MC band (autocorrelated chains)
    diff = np.abs(np.asarray(mc) - np.asarray(scs))
    tol = np.array([0.05, 0.12, 0.10, 0.12, 0.20])
    assert (diff < tol).all(), (np.asarray(mc), np.asarray(scs), diff)


def test_geweke_selection_mh():
    _compare(KEY, use_hmc=False)


def test_geweke_hmc():
    _compare(jax.random.fold_in(KEY, 7), use_hmc=True)


# ---- Particle Gibbs: the successive-conditional sampler alternates a
# conditional-SMC trajectory sweep p(x | y) with exact data resampling
# y_t ~ p(y_t | x_t). Any bias in the CSMC lane-0 weight, the conditional
# resampling, or the ancestor-sampling weights shifts the joint moments. --


A_, Q_, C_, R_ = 0.7, 0.6, 1.0, 0.5
T_GW, N_PART = 6, 16


@gen
def gw_kernel(t, prev):
    first = t == 0
    x = gt.normal(jnp.where(first, 0.0, A_ * prev),
                  jnp.sqrt(jnp.where(first, 1.0, Q_))) @ "x"
    gt.normal(C_ * x, jnp.sqrt(R_)) @ "y"
    return x


def _simulate_path(key):
    """Forward-simulate one (x, y) trajectory; returns (T,) leaves."""
    def step(prev, inp):
        t, k = inp
        tr = gw_kernel.simulate(k, (t, prev))
        return tr.get_retval(), (tr["x"], tr["y"])

    _, (xs, ys) = jax.lax.scan(
        step, 0.0, (jnp.arange(T_GW), jax.random.split(key, T_GW)))
    return xs, ys


def _pg_moments(xs, ys):
    return jnp.stack([xs.mean(), (xs ** 2).mean(), ys.mean(),
                      (xs * ys).mean(), xs[..., -1].mean(),
                      (xs[..., 0] ** 2).mean()])


def _pg_successive(key, n_chains, n_sweeps, ancestor_sampling):
    from gen_tpu.combinators.vector import VectorChoiceMap
    from gen_tpu.inference import particle_gibbs_step

    k_init, k_run = jax.random.split(key)
    xs0, ys0 = jax.vmap(_simulate_path)(jax.random.split(k_init, n_chains))

    def sweep(carry, sk):
        xs, ys = carry  # (chains, T)
        ks = jax.vmap(lambda i: jax.random.fold_in(sk, i))(
            jnp.arange(n_chains))

        def one(x, y, k):
            k1, k2 = jax.random.split(k)
            inner = gt.ChoiceMap().set_value("x", x).set_value("y", y)
            obs = VectorChoiceMap(gt.ChoiceMap().set_value("y", y), T_GW)
            ref, _ = particle_gibbs_step(
                k1, gw_kernel, 0.0, (), obs, VectorChoiceMap(inner, T_GW),
                N_PART, ancestor_sampling=ancestor_sampling)
            new_x = ref.inner.get_value("x")
            new_y = C_ * new_x + jnp.sqrt(R_) * jax.random.normal(
                k2, (T_GW,))
            return new_x, new_y

        xs, ys = jax.vmap(one)(xs, ys, ks)
        return (xs, ys), (xs, ys)

    _, (xs_all, ys_all) = jax.lax.scan(
        sweep, (xs0, ys0), jax.random.split(k_run, n_sweeps))
    burn = n_sweeps // 3
    return xs_all[burn:].reshape(-1, T_GW), ys_all[burn:].reshape(-1, T_GW)


def _pg_compare(key, ancestor_sampling):
    n = 120_000
    xs_mc, ys_mc = jax.vmap(_simulate_path)(
        jax.random.split(jax.random.fold_in(key, 0), n))
    mc = _pg_moments(xs_mc, ys_mc)
    xs_sc, ys_sc = jax.jit(lambda k: _pg_successive(
        k, 64, 300, ancestor_sampling))(jax.random.fold_in(key, 1))
    sc = _pg_moments(xs_sc, ys_sc)
    diff = np.abs(np.asarray(mc) - np.asarray(sc))
    tol = np.array([0.05, 0.10, 0.06, 0.10, 0.08, 0.10])
    assert (diff < tol).all(), (np.asarray(mc), np.asarray(sc), diff)


def test_geweke_particle_gibbs():
    _pg_compare(jax.random.fold_in(KEY, 21), ancestor_sampling=False)


def test_geweke_particle_gibbs_ancestor_sampling():
    _pg_compare(jax.random.fold_in(KEY, 22), ancestor_sampling=True)


# ---- MALA and elliptical slice through the same joint harness ----------


def test_geweke_mala():
    from gen_tpu.inference import mala

    def _succ(key, n_chains, n_steps):
        k_init, k_run = jax.random.split(key)
        traces = jax.vmap(lambda k: joint.simulate(k, ()))(
            jax.random.split(k_init, n_chains))

        def step(trs, sk):
            ks = jax.vmap(lambda i: jax.random.fold_in(sk, i))(
                jnp.arange(n_chains))

            def one(tr, k):
                k1, k2 = jax.random.split(k)
                tr, _ = mala(k1, tr, LATENTS, tau=0.02)
                new, w, _ = joint.regenerate(k2, tr, (), (), DATA)
                return new, w

            trs, ws = jax.vmap(one)(trs, ks)
            return trs, (trs["theta"], trs["scale"], trs["y"], ws)

        _, (th, sc, y, ws) = jax.lax.scan(
            step, traces, jax.random.split(k_run, 500))
        burn = 150
        return (th[burn:].reshape(-1), sc[burn:].reshape(-1),
                y[burn:].reshape(-1), ws)

    key = jax.random.fold_in(KEY, 31)
    mc = _moments(*_marginal_conditional(jax.random.fold_in(key, 0),
                                         200_000))
    th, sc, y, ws = jax.jit(lambda k: _succ(k, 256, 500))(
        jax.random.fold_in(key, 1))
    scs = _moments(th, sc, y)
    np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-9)
    diff = np.abs(np.asarray(mc) - np.asarray(scs))
    tol = np.array([0.06, 0.15, 0.12, 0.15, 0.25])
    assert (diff < tol).all(), (np.asarray(mc), np.asarray(scs), diff)


def test_geweke_elliptical_slice():
    """Joint over an MVN-prior vector latent + Gaussian data; alternates
    ESS over the latent with exact data resampling. Guards the
    likelihood-ratio threshold (incl. the float32 projection fix)."""
    from gen_tpu.inference import elliptical_slice

    d = 3
    cov = jnp.asarray([[1.0, 0.6, 0.3], [0.6, 1.0, 0.6], [0.3, 0.6, 1.0]])

    @gen
    def es_joint():
        f = gt.mvnormal(jnp.zeros(d), cov) @ "f"
        gt.normal(f, 0.7) @ "y"
        return f

    def mc_moments(f, y):
        return jnp.stack([f.mean(), (f ** 2).mean(), y.mean(),
                          (f * y).mean()])

    key = jax.random.fold_in(KEY, 41)
    trs = jax.vmap(lambda k: es_joint.simulate(k, ()))(
        jax.random.split(jax.random.fold_in(key, 0), 100_000))
    mc = mc_moments(trs["f"], trs["y"])

    def _succ(k, n_chains, n_steps):
        k_init, k_run = jax.random.split(k)
        traces = jax.vmap(lambda kk: es_joint.simulate(kk, ()))(
            jax.random.split(k_init, n_chains))

        def step(trs, sk):
            ks = jax.vmap(lambda i: jax.random.fold_in(sk, i))(
                jnp.arange(n_chains))

            def one(tr, kk):
                k1, k2 = jax.random.split(kk)
                tr = elliptical_slice(k1, tr, "f", jnp.zeros(d), cov)
                new, w, _ = es_joint.regenerate(k2, tr, (), (),
                                                select("y"))
                return new, w

            trs, ws = jax.vmap(one)(trs, ks)
            return trs, (trs["f"], trs["y"], ws)

        _, (fs, ys, ws) = jax.lax.scan(step, traces,
                                       jax.random.split(k_run, 400))
        burn = 100
        return (fs[burn:].reshape(-1, d), ys[burn:].reshape(-1, d), ws)

    fs, ys, ws = jax.jit(lambda k: _succ(k, 128, 400))(
        jax.random.fold_in(key, 1))
    np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-9)
    scs = mc_moments(fs, ys)
    diff = np.abs(np.asarray(mc) - np.asarray(scs))
    tol = np.array([0.04, 0.07, 0.05, 0.08])
    assert (diff < tol).all(), (np.asarray(mc), np.asarray(scs), diff)
