from .common import select_trace, mh_accept
from .importance import importance_sampling, importance_resampling
from .mh import mh, metropolis_hastings, mh_selection, mh_proposal
from .hmc import hmc, hmc_chain, hmc_chains
from .mala import mala
from .map_optimize import map_optimize
from .elliptical_slice import elliptical_slice
from .nuts import (nuts, nuts_flat, nuts_warmup_and_sample, da_init,
                   da_update, find_reasonable_step_size, NUTSStats)
from .target import FlatTarget
from .chees import chees_hmc_warmup_and_sample
from .trace_translators import (transform, TraceTransform, TransformContext,
                                DeterministicTraceTranslator,
                                GeneralTraceTranslator,
                                SimpleExtendingTraceTranslator,
                                SymmetricTraceTranslator, mh_involutive,
                                involutive_mcmc)
from .kernel_dsl import (primitive_kernel, reversal, seq, repeat, for_range, mixture,
                         cond_kernel, check_observations, checked)
from ..combinators.arena import smc_run  # noqa: F401 (SMC convenience)
from .smc import smc_genealogy, reconstruct_trajectories
from .csmc import (csmc_genealogy, particle_gibbs, particle_gibbs_step,
                   check_state_is_choice_determined)
from .enumerate import enumerate_posterior, enumerate_marginals
from .gibbs import gibbs, gibbs_conditional
from .mixed import (DiscreteSite, discover_discrete_sites, gibbs_sweep,
                    mixed_warmup_and_sample)
from .laplace import LaplaceResult, laplace_approx, laplace_sample
from .psis import PSISResult, psis, psis_effective_sample_size, gpd_fit
from .sample import PosteriorSamples, sample_posterior
from .sbc import sbc_ranks, sbc_uniformity
from .predictive import posterior_predictive, prior_predictive
from .nuts_fsm import FSMResult, nuts_fsm, nuts_fsm_warmup_and_sample
from .sgmcmc import MinibatchTarget, sgld_step, sghmc_step, sgld_chain
from .tempering import (TemperedTarget, ais, smc_sampler,
                        smc_sampler_adaptive, parallel_tempering)
from .particle_filter import (ParticleFilterState, initialize_particle_filter,
                              particle_filter_step, maybe_resample,
                              log_ml_estimate, effective_sample_size,
                              sample_unweighted_traces)

__all__ = [
    "select_trace", "mh_accept",
    "importance_sampling", "importance_resampling",
    "mh", "metropolis_hastings", "mh_selection", "mh_proposal",
    "hmc", "hmc_chain", "hmc_chains", "mala", "map_optimize", "elliptical_slice",
    "ParticleFilterState", "initialize_particle_filter",
    "particle_filter_step", "maybe_resample", "log_ml_estimate",
    "effective_sample_size", "sample_unweighted_traces", "smc_run",
    "smc_genealogy", "reconstruct_trajectories",
    "csmc_genealogy", "particle_gibbs", "particle_gibbs_step",
    "check_state_is_choice_determined",
    "enumerate_posterior", "enumerate_marginals",
    "gibbs", "gibbs_conditional",
    "DiscreteSite", "discover_discrete_sites", "gibbs_sweep",
    "mixed_warmup_and_sample",
    "LaplaceResult", "laplace_approx", "laplace_sample",
    "PSISResult", "psis", "psis_effective_sample_size", "gpd_fit",
    "PosteriorSamples", "sample_posterior",
    "sbc_ranks", "sbc_uniformity",
    "posterior_predictive", "prior_predictive",
    "FSMResult", "nuts_fsm", "nuts_fsm_warmup_and_sample",
    "MinibatchTarget", "sgld_step", "sghmc_step", "sgld_chain",
    "TemperedTarget", "ais", "smc_sampler", "smc_sampler_adaptive",
    "parallel_tempering",
    "nuts", "nuts_flat", "nuts_warmup_and_sample", "da_init", "da_update",
    "find_reasonable_step_size", "NUTSStats", "FlatTarget",
    "chees_hmc_warmup_and_sample",
    "transform", "TraceTransform", "TransformContext",
    "DeterministicTraceTranslator", "GeneralTraceTranslator",
    "SimpleExtendingTraceTranslator", "SymmetricTraceTranslator",
    "mh_involutive", "involutive_mcmc",
    "primitive_kernel", "reversal", "seq", "repeat", "for_range", "mixture",
    "cond_kernel", "check_observations", "checked",
]

from .resumable import resumable_run  # noqa: E402,F401
