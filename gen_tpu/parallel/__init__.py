from .mesh import chain_mesh, shard_keys, device_count
from .multihost import initialize_multihost, slice_mesh, hierarchical_mesh
from .sharded import (sharded_importance_sampling, sharded_mcmc_step,
                      sharded_hmc_chains, sharded_particle_filter_init,
                      sharded_maybe_resample, sharded_vi_step,
                      sharded_hmc_chains_fused,
                      sharded_nuts_chains_fused)
from .distributed_smc import sharded_smc_genealogy, sharded_smc_sampler

__all__ = [
    "chain_mesh", "shard_keys", "device_count",
    "initialize_multihost", "slice_mesh", "hierarchical_mesh",
    "sharded_importance_sampling", "sharded_mcmc_step",
    "sharded_hmc_chains", "sharded_particle_filter_init",
    "sharded_maybe_resample", "sharded_vi_step",
    "sharded_hmc_chains_fused",
    "sharded_nuts_chains_fused",
    "sharded_smc_genealogy", "sharded_smc_sampler",
]
