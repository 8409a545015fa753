"""Dense mass matrices via Cholesky whitening.

Reference semantics: Gen.jl's HMC takes a scalar/diagonal metric only
(/root/reference/src/inference/hmc.jl:25-73); a dense metric is the
standard extension (Stan's dense_e). TPU-native twist: instead of teaching
the fused Pallas kernels (ops/hmc_fused.py, ops/nuts_fused.py) a dense
M^-1 — triangular solves per leapfrog — we WHITEN THE COORDINATES once:

  Sigma ~ cross-chain covariance of the warmed population, Sigma = L L^T
  y = L^-1 x  =>  pi_y(y) = pi_x(L y) (+ const log|L|),

and run the existing kernels on ``pi_y`` with IDENTITY mass. HMC on y with
identity mass is exactly HMC on x with dense mass M = (L L^T)^-1 = Sigma^-1
(the optimal Gaussian-approximation metric). The wrapped logp's ``L @ y``
matmul stages through :mod:`gen_tpu.ops.scalarize` like any other residual
``dot_general`` (unrolled multiply-adds; L's d^2 entries ride in as staged
residual constants), so the kernels are untouched — no in-kernel
triangular solves, no new Mosaic surface.

Workflow (see benchmarks/bench_hard_targets.py ``mass="dense"`` and
``sample_posterior(..., mass="dense")``):

1. diagonal ChEES warmup -> warmed population ``flat`` (chains, d)
2. ``L = dense_mass_chol(flat)``; ``ys = whiten(L, flat)``
3. short second ChEES warmup on ``whiten_logp(logp, L)`` with
   ``adapt_mass=False`` (the whitened target is ~isotropic; only the step
   size / trajectory length need re-adapting)
4. fused kernel on the whitened target, identity mass
5. ``unwhiten(L, draws)`` back to x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_mass_chol(flat, jitter_rel: float = 1e-5):
    """Cholesky factor L of the cross-chain covariance (+ relative jitter):
    ``Sigma = L L^T``. ``flat``: (chains, d) warmed population."""
    flat = jnp.asarray(flat, jnp.float32)
    n, d = flat.shape
    x = flat - jnp.mean(flat, axis=0)
    sigma = (x.T @ x) / jnp.maximum(n - 1, 1)
    jitter = jitter_rel * (jnp.trace(sigma) / d)
    return jnp.linalg.cholesky(sigma + jitter * jnp.eye(d, dtype=sigma.dtype))


def whiten_logp(logp, L):
    """``pi_y(y) = pi_x(L y)``. The additive log|L| constant is dropped —
    it cancels in every MH/NUTS energy difference."""
    L = jnp.asarray(L)

    def logp_w(y):
        return logp(L @ y)

    return logp_w


def whiten(L, x):
    """x -> y = L^-1 x, batched over a leading chain axis."""
    return jax.scipy.linalg.solve_triangular(
        L, jnp.asarray(x).T, lower=True).T


def unwhiten(L, y):
    """y -> x = L y; works on (chains, d) and (steps, chains, d)."""
    y = jnp.asarray(y)
    return jnp.einsum("ij,...j->...i", L, y)
