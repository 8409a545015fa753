from .distribution import Distribution
from .continuous import (
    Normal, normal, broadcasted_normal, normal_linear, mvnormal, uniform,
    uniform_continuous, beta, beta_uniform, gamma, inv_gamma, exponential,
    cauchy, laplace, piecewise_uniform, student_t, dirichlet,
    piecewise_poisson_process, PiecewisePoissonProcess,
)
from .mixture import HomogeneousMixture, HeterogeneousMixture
from .dist_dsl import (TransformedDistribution, RelabeledDistribution,
                       ArgMappedDistribution, Bijection, affine_bijection,
                       exp_of, log_of, dist, enum_dist)
from .discrete import (
    bernoulli, categorical, labeled_categorical, uniform_discrete, poisson,
    binom, geometric, neg_binom, dirac, multinomial,
)

__all__ = [
    "Distribution",
    "normal", "broadcasted_normal", "normal_linear", "mvnormal", "uniform",
    "uniform_continuous", "beta", "beta_uniform", "gamma", "inv_gamma",
    "exponential", "cauchy", "laplace", "piecewise_uniform", "student_t",
    "dirichlet", "piecewise_poisson_process", "PiecewisePoissonProcess",
    "HomogeneousMixture", "HeterogeneousMixture",
    "TransformedDistribution", "RelabeledDistribution",
    "ArgMappedDistribution", "Bijection", "affine_bijection", "exp_of", "enum_dist",
    "log_of", "dist",
    "bernoulli", "categorical", "labeled_categorical", "uniform_discrete",
    "poisson", "binom", "geometric", "neg_binom", "dirac",
    "multinomial",
]
