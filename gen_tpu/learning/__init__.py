from .optimization import (FixedStepGradientDescent, GradientDescent, ADAM,
                           Optax, ParamUpdate, apply_update)
from .variational import (black_box_vi, black_box_vimco, reparam_vi,
                          single_sample_gradient_estimate,
                          multi_sample_gradient_estimate,
                          vimco_geometric_baselines,
                          vimco_arithmetic_baselines)
from .train import train, lecture, lecture_batched

__all__ = [
    "FixedStepGradientDescent", "GradientDescent", "ADAM", "Optax",
    "ParamUpdate", "apply_update",
    "black_box_vi", "black_box_vimco", "reparam_vi",
    "single_sample_gradient_estimate", "multi_sample_gradient_estimate",
    "vimco_geometric_baselines", "vimco_arithmetic_baselines",
    "train", "lecture", "lecture_batched",
]
