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


# -- diagonal + low-rank metric ----------------------------------------------
# A dense L stages d^2 residual scalars into the kernel; the scalarization
# residual cap (ops/scalarize.py, 1024 scalars) limits that to d <~ 30.
# The production-standard fallback is diag + rank-k: Sigma ~ D^1/2 (s0^2 I
# + U diag(lam_k - s0^2) U^T) D^1/2, whose whitening transform costs
# d + d*k + k + 1 staged scalars and covers the kernels' full dimension
# envelope (ops/hmc_fused.py:check_vmem_envelope).

def lowrank_mass_factors(flat, k: int, inv_mass_diag=None):
    """Estimate a diag + rank-k metric from the warmed population.

    Returns ``(sqrt_d, U, sk, s0)``: ``sqrt_d = sqrt(inv_mass_diag)^-1``
    standardizes per-coordinate scale first (pass the ChEES diagonal);
    ``U (d, k)`` top-k eigenvectors of the standardized covariance,
    ``sk (k,)`` their singular values (sqrt eigenvalues), ``s0`` the sqrt
    of the average residual eigenvalue."""
    flat = jnp.asarray(flat, jnp.float32)
    n, d = flat.shape
    if not 0 < k < d:
        raise ValueError(f"lowrank rank k={k} must be in (0, {d})")
    sqrt_d = (jnp.ones(d, jnp.float32) if inv_mass_diag is None
              else jnp.sqrt(jnp.asarray(inv_mass_diag, jnp.float32)))
    x = (flat - jnp.mean(flat, axis=0)) / jnp.maximum(sqrt_d, 1e-12)
    # right singular vectors of X/sqrt(n-1) are eigenvectors of Sigma_std
    _, s, vt = jnp.linalg.svd(x / jnp.sqrt(jnp.maximum(n - 1, 1)),
                              full_matrices=False)
    lam = s ** 2
    lam_k = lam[:k]
    lam_bar = (jnp.sum(lam) - jnp.sum(lam_k)) / jnp.maximum(d - k, 1)
    lam_bar = jnp.maximum(lam_bar, 1e-10)
    return sqrt_d, vt[:k].T, jnp.sqrt(lam_k), jnp.sqrt(lam_bar)


def lowrank_transform(sqrt_d, U, sk, s0, y):
    """x = A y with A = diag(sqrt_d) (s0 I + U diag(sk - s0) U^T):
    A A^T = diag(sqrt_d) (s0^2 I + U diag(sk^2 - s0^2) U^T) diag(sqrt_d)
    = the estimated metric. Works on (..., d)."""
    inner = jnp.einsum("dk,...d->...k", U, y)
    z = s0 * y + jnp.einsum("dk,...k->...d", U, (sk - s0) * inner)
    return sqrt_d * z


def lowrank_inverse_transform(sqrt_d, U, sk, s0, x):
    """y = A^-1 x (A is simultaneously diagonalized by (I, U))."""
    z = x / jnp.maximum(sqrt_d, 1e-12)
    inner = jnp.einsum("dk,...d->...k", U, z)
    return z / s0 + jnp.einsum("dk,...k->...d", U,
                               (1.0 / sk - 1.0 / s0) * inner)


def lowrank_whiten_logp(logp, sqrt_d, U, sk, s0):
    """pi_y(y) = pi_x(A y); log|A| constant dropped (cancels in MH)."""
    sqrt_d, U = jnp.asarray(sqrt_d), jnp.asarray(U)
    sk, s0 = jnp.asarray(sk), jnp.asarray(s0)

    def logp_w(y):
        return logp(lowrank_transform(sqrt_d, U, sk, s0, y))

    return logp_w
