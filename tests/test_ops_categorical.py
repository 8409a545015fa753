"""Batched categorical op: XLA fallback correctness on CPU; the Pallas path
is exercised on real TPU (chi-square + distinct-row checks mirrored in the
kernel's docstring measurements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gen_tpu.ops import batched_categorical, categorical_fast


def test_fallback_matches_jax_random():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (64, 7))
    out = batched_categorical(key, logits, use_pallas=False)
    ref = jax.random.categorical(key, logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.dtype == jnp.int32


def test_categorical_fast_distribution():
    probs = np.array([0.1, 0.2, 0.65, 0.05])
    logits = jnp.tile(jnp.log(jnp.asarray(probs)), (20000, 1))
    out = np.asarray(categorical_fast(jax.random.PRNGKey(2), logits))
    freq = np.bincount(out, minlength=4) / out.shape[0]
    np.testing.assert_allclose(freq, probs, atol=0.02)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas TPU kernel needs real TPU")
def test_pallas_chi_square():
    probs = np.array([0.05, 0.1, 0.2, 0.02, 0.33, 0.25, 0.05])
    n = 1 << 16
    logits = jnp.tile(jnp.log(jnp.asarray(probs, jnp.float32)), (n, 1))
    s = np.asarray(batched_categorical(jax.random.PRNGKey(0), logits,
                                       use_pallas=True))
    counts = np.bincount(s, minlength=7)
    exp = probs * n
    chi2 = ((counts - exp) ** 2 / exp).sum()
    assert chi2 < 30  # df=6, 99.9% critical value ~22.5


def test_interpret_kernel_matches_gumbel_argmax_exactly():
    """The ACTUAL categorical kernel under the Pallas TPU interpreter with
    injected uniforms must reproduce the XLA gumbel-argmax index for index
    (incl. the K-padding mask and tie-breaking toward the lowest index)."""
    from gen_tpu.ops.categorical import batched_categorical
    with jax.enable_x64(False):
        rng = np.random.default_rng(0)
        n, k = 300, 37      # non-multiples of the tile sizes: padding active
        logits = jnp.asarray(rng.standard_normal((n, k)) * 2.0, jnp.float32)
        u = jnp.asarray(rng.uniform(1e-6, 1.0, (n, k)), jnp.float32)
        got = batched_categorical(jax.random.PRNGKey(0), logits,
                                  injected_u=u, interpret=True)
        g = -jnp.log(-jnp.log(u))
        want = jnp.argmax(logits + g, axis=1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
