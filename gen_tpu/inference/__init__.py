from .common import select_trace, mh_accept
from .importance import importance_sampling, importance_resampling
from .mh import mh, metropolis_hastings, mh_selection, mh_proposal
from .hmc import hmc
from .mala import mala
from .map_optimize import map_optimize
from .elliptical_slice import elliptical_slice

__all__ = [
    "select_trace", "mh_accept",
    "importance_sampling", "importance_resampling",
    "mh", "metropolis_hastings", "mh_selection", "mh_proposal",
    "hmc", "mala", "map_optimize", "elliptical_slice",
]
