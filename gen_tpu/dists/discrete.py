"""Discrete distributions.

Parameterizations follow /root/reference/src/modeling_library/distributions/
(cited per class). One indexing departure: ``categorical`` and
``uniform_discrete`` are **0-based** here (Julia is 1-based); tests and
examples account for this.

All logpdfs sum over elements (see continuous.py docstring) and are
differentiable w.r.t. their continuous parameters (probabilities, rates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy, xlog1py

from .distribution import Distribution, _f


class Bernoulli(Distribution):
    """bernoulli(p) -> bool. Reference: distributions/bernoulli.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True,)

    def sample(self, key, p):
        return jax.random.bernoulli(key, _f(p))

    def logpdf(self, v, p):
        p = _f(p)
        vf = jnp.asarray(v, dtype=p.dtype)
        return jnp.sum(xlogy(vf, p) + xlog1py(1.0 - vf, -p))

    def enumerate_support(self, p):
        return jnp.asarray([False, True])


class Categorical(Distribution):
    """categorical(probs) -> int index in [0, n). Reference:
    distributions/categorical.jl (0-based here)."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True,)

    def sample(self, key, probs):
        return jax.random.categorical(key, jnp.log(_f(probs)), axis=-1)

    def logpdf(self, v, probs):
        probs = _f(probs)
        v = jnp.asarray(v)
        if probs.ndim == 1:
            return jnp.sum(jnp.log(probs[v]))
        # batched: v (...,), probs (..., n)
        lp = jnp.log(jnp.take_along_axis(probs, v[..., None], axis=-1))[..., 0]
        return jnp.sum(lp)

    def enumerate_support(self, probs):
        # support size is the (static) trailing axis length; contents may
        # be traced — only the shape is read
        return jnp.arange(jnp.shape(probs)[-1], dtype=jnp.int32)


class LabeledCategorical(Distribution):
    """categorical over explicit labels — helper used by the @dist DSL's
    relabeling (reference: dist_dsl/relabeled_distribution.jl)."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True,)

    def sample(self, key, probs):
        return jax.random.categorical(key, jnp.log(_f(probs)), axis=-1)

    def logpdf(self, v, probs):
        probs = _f(probs)
        return jnp.sum(jnp.log(probs[jnp.asarray(v)]))

    def enumerate_support(self, probs):
        return jnp.arange(jnp.shape(probs)[-1], dtype=jnp.int32)


class UniformDiscrete(Distribution):
    """uniform_discrete(low, high) -> int in [low, high] inclusive.
    Reference: distributions/uniform_discrete.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (False, False)

    def sample(self, key, low, high):
        return jax.random.randint(key, (), low, high + 1)

    def logpdf(self, v, low, high):
        v = jnp.asarray(v)
        n = jnp.asarray(high - low + 1, dtype=jnp.result_type(float))
        inside = (v >= low) & (v <= high)
        return jnp.sum(jnp.where(inside, -jnp.log(n), -jnp.inf))

    def enumerate_support(self, low, high):
        import numpy as _np
        if isinstance(low, jax.core.Tracer) or isinstance(
                high, jax.core.Tracer):
            raise NotImplementedError(
                "uniform_discrete support bounds are traced values — the "
                "support cannot be enumerated statically; pass explicit "
                "discrete_supports= covering the widest possible range")
        return jnp.arange(int(_np.asarray(low)),
                          int(_np.asarray(high)) + 1, dtype=jnp.int32)


class Poisson(Distribution):
    """poisson(lam). Reference: distributions/poisson.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True,)

    def sample(self, key, lam):
        return jax.random.poisson(key, _f(lam))

    def logpdf(self, v, lam):
        lam = _f(lam)
        vf = jnp.asarray(v, dtype=lam.dtype)
        inside = vf >= 0
        lp = xlogy(vf, lam) - lam - gammaln(vf + 1.0)
        return jnp.sum(jnp.where(inside, lp, -jnp.inf))


class Binomial(Distribution):
    """binom(n, p). Reference: distributions/binom.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (False, True)

    def sample(self, key, n, p):
        return jax.random.binomial(key, n, _f(p)).astype(jnp.int32)

    def logpdf(self, v, n, p):
        p = _f(p)
        vf = jnp.asarray(v, dtype=p.dtype)
        nf = jnp.asarray(n, dtype=p.dtype)
        inside = (vf >= 0) & (vf <= nf)
        logcomb = gammaln(nf + 1) - gammaln(vf + 1) - gammaln(nf - vf + 1)
        lp = logcomb + xlogy(vf, p) + xlog1py(nf - vf, -p)
        return jnp.sum(jnp.where(inside, lp, -jnp.inf))

    def enumerate_support(self, n, p):
        import numpy as _np
        if isinstance(n, jax.core.Tracer):
            raise NotImplementedError(
                "binom trial count is a traced value — the support cannot "
                "be enumerated statically; pass explicit discrete_supports=")
        return jnp.arange(int(_np.asarray(n)) + 1, dtype=jnp.int32)


class Geometric(Distribution):
    """geometric(p): number of failures before first success, support
    {0,1,...}. Reference: distributions/geometric.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True,)

    def sample(self, key, p):
        p = _f(p)
        u = jax.random.uniform(key, jnp.shape(p))
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-p)).astype(jnp.int32)

    def logpdf(self, v, p):
        p = _f(p)
        vf = jnp.asarray(v, dtype=p.dtype)
        inside = vf >= 0
        lp = jnp.log(p) + xlog1py(vf, -p)
        return jnp.sum(jnp.where(inside, lp, -jnp.inf))


class NegativeBinomial(Distribution):
    """neg_binom(r, p): number of failures before the r-th success.
    Reference: distributions/neg_binom.jl."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (True, True)

    def sample(self, key, r, p):
        # gamma-poisson mixture: lam ~ Gamma(r, (1-p)/p); x ~ Poisson(lam)
        r, p = _f(r), _f(p)
        kg, kp = jax.random.split(key)
        lam = jax.random.gamma(kg, r) * (1.0 - p) / p
        return jax.random.poisson(kp, lam)

    def logpdf(self, v, r, p):
        r, p = _f(r), _f(p)
        vf = jnp.asarray(v, dtype=p.dtype)
        inside = vf >= 0
        lp = (gammaln(vf + r) - gammaln(r) - gammaln(vf + 1)
              + r * jnp.log(p) + xlog1py(vf, -p))
        return jnp.sum(jnp.where(inside, lp, -jnp.inf))


class Multinomial(Distribution):
    """multinomial(n, probs) -> (k,) counts summing to n. Not in the
    reference; the count-data companion to categorical/dirichlet."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (False, True)

    def sample(self, key, n, probs):
        return jax.random.multinomial(key, n, _f(probs))

    def logpdf(self, v, n, probs):
        probs = _f(probs)
        vf = jnp.asarray(v, dtype=probs.dtype)
        lp = (gammaln(jnp.asarray(n, probs.dtype) + 1.0)
              - jnp.sum(gammaln(vf + 1.0), axis=-1)
              + jnp.sum(xlogy(vf, probs), axis=-1))
        ok = jnp.sum(vf, axis=-1) == n
        return jnp.sum(jnp.where(ok, lp, -jnp.inf))


class Dirac(Distribution):
    """dirac(v) -> v: a point mass. Reference: the pmmh example defines
    this ad hoc (examples/pmmh/model.jl); here it is a library distribution.
    logpdf is 0 where the value matches and -inf elsewhere (within a tiny
    float tolerance so round-tripping through f32 trace storage is safe).
    Useful for clamping addresses and for degenerate mixture components."""

    is_discrete = True
    has_output_grad = False
    arg_grads = (False,)

    def sample(self, key, v):
        return jnp.asarray(v)

    def logpdf(self, v, expected):
        v = jnp.asarray(v)
        expected = jnp.asarray(expected, dtype=v.dtype)
        if jnp.issubdtype(v.dtype, jnp.inexact):
            eps = 1e-6
            match = jnp.abs(v - expected) <= eps * (1.0 + jnp.abs(expected))
        else:
            match = v == expected
        return jnp.sum(jnp.where(match, 0.0, -jnp.inf))


bernoulli = Bernoulli()
dirac = Dirac()
multinomial = Multinomial()
categorical = Categorical()
labeled_categorical = LabeledCategorical()
uniform_discrete = UniformDiscrete()
poisson = Poisson()
binom = Binomial()
geometric = Geometric()
neg_binom = NegativeBinomial()
