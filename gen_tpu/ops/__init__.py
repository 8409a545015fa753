"""Pallas TPU kernels for the framework's hot ops, with identical-semantics
jnp fallbacks off-TPU (see ops/resample.py)."""

from .resample import systematic_resample, on_tpu

__all__ = ["systematic_resample", "on_tpu"]
