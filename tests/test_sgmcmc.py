"""SGLD/SGHMC: exact unbiasedness of the GFI minibatch gradient estimator
over a partition, and posterior recovery on a conjugate regression."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import MinibatchTarget, sgld_chain
from gen_tpu.inference.target import FlatTarget

KEY = jax.random.PRNGKey(0)

N, M = 256, 32
SIGMA = 0.5
RNG = np.random.default_rng(2)
XS = jnp.asarray(RNG.uniform(-1, 1, N))
W_TRUE = 0.8
YS = jnp.asarray(W_TRUE * np.asarray(XS) + SIGMA * RNG.standard_normal(N))


@gen
def reg_model(xs):
    w = gt.normal(0.0, 1.0) @ "w"
    gt.normal(w * xs, SIGMA) @ "ys"


SEL = select("w")


def exact_posterior():
    xs, ys = np.asarray(XS), np.asarray(YS)
    prec = 1.0 + np.sum(xs ** 2) / SIGMA ** 2
    mean = (np.sum(xs * ys) / SIGMA ** 2) / prec
    return mean, 1.0 / np.sqrt(prec)


def _batches():
    """Disjoint equal partition of the data into N//M batches."""
    s = N // M
    xs = XS.reshape(s, M)
    ys = YS.reshape(s, M)
    return (xs,), choicemap(ys=ys)  # leaves carry leading batch axis


def test_minibatch_gradient_is_exactly_unbiased_over_partition():
    tr, _ = reg_model.generate(KEY, (XS[:M],), choicemap(ys=YS[:M]))
    target = MinibatchTarget(tr, SEL, n_total=N, batch_size=M)
    flat = jnp.asarray([0.3])

    (bxs,), bobs = _batches()
    s = N // M
    grads = [np.asarray(target.grad_estimate(
        flat, (bxs[i],), choicemap(ys=bobs.get_value("ys")[i])))
        for i in range(s)]
    avg = np.mean(grads, axis=0)

    # full-data gradient of the exact log-posterior
    full_tr, _ = reg_model.generate(KEY, (XS,), choicemap(ys=YS))
    full = FlatTarget(full_tr, SEL)
    _, g_full = full.value_and_grad(flat)
    np.testing.assert_allclose(avg, np.asarray(g_full), rtol=1e-9)


def test_sgld_recovers_conjugate_posterior():
    tr, _ = reg_model.generate(KEY, (XS[:M],), choicemap(ys=YS[:M]))
    target = MinibatchTarget(tr, SEL, n_total=N, batch_size=M)
    bargs, bobs = _batches()
    hist = jax.jit(lambda k: sgld_chain(
        k, target, bargs, bobs, step_size=1e-4, n_passes=800))(
        jax.random.PRNGKey(1))
    ws = np.asarray(hist)[800:, 0]
    mean, std = exact_posterior()
    assert abs(ws.mean() - mean) < 0.02, (ws.mean(), mean)
    # constant-step SGLD inflates variance by O(eps); generous bound
    assert abs(ws.std() - std) < 0.3 * std, (ws.std(), std)


def test_sghmc_step_moves_toward_high_density():
    from gen_tpu.inference import sghmc_step
    tr, _ = reg_model.generate(KEY, (XS[:M],), choicemap(ys=YS[:M]))
    target = MinibatchTarget(tr, SEL, n_total=N, batch_size=M)
    bargs, bobs = _batches()
    flat = jnp.asarray([-2.0])
    p = jnp.zeros(1)
    for i in range(200):
        g = target.grad_estimate(flat, (bargs[0][i % 8],),
                                 choicemap(ys=bobs.get_value("ys")[i % 8]))
        flat, p = sghmc_step(jax.random.fold_in(KEY, i), flat, p, g,
                             step_size=1e-4, friction=0.3)
    mean, _ = exact_posterior()
    assert abs(float(flat[0]) - mean) < 0.2
