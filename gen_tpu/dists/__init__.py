from .distribution import Distribution
from .continuous import (
    Normal, normal, broadcasted_normal, mvnormal, uniform, uniform_continuous,
    beta, beta_uniform, gamma, inv_gamma, exponential, cauchy, laplace,
    piecewise_uniform,
)
from .mixture import HomogeneousMixture, HeterogeneousMixture
from .discrete import (
    bernoulli, categorical, labeled_categorical, uniform_discrete, poisson,
    binom, geometric, neg_binom,
)

__all__ = [
    "Distribution",
    "normal", "broadcasted_normal", "mvnormal", "uniform",
    "uniform_continuous", "beta", "beta_uniform", "gamma", "inv_gamma",
    "exponential", "cauchy", "laplace", "piecewise_uniform",
    "HomogeneousMixture", "HeterogeneousMixture",
    "bernoulli", "categorical", "labeled_categorical", "uniform_discrete",
    "poisson", "binom", "geometric", "neg_binom",
]
