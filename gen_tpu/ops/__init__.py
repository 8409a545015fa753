"""Pallas TPU kernels for the framework's hot ops, with identical-semantics
jnp fallbacks off-TPU (see ops/resample.py)."""

from .resample import systematic_resample, on_tpu
from .categorical import batched_categorical, categorical_fast
from .hmc_fused import hmc_chains_fused
from .scalarize import stage_scalarized

__all__ = ["systematic_resample", "on_tpu",
           "batched_categorical", "categorical_fast",
           "hmc_chains_fused", "stage_scalarized"]
