"""Amortized / supervised training of generative functions.

Reference: /root/reference/src/inference/train.jl (train!, lecture!,
lecture_batched!). The per-minibatch gradient accumulation is vectorized
when the data generator produces uniform shapes."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..gfi import GenerativeFunction
from .optimization import ParamUpdate


def train(key, gen_fn: GenerativeFunction, data_generator: Callable,
          update: ParamUpdate, num_epoch=1, epoch_size=1, num_minibatch=1,
          minibatch_size=1, evaluation_size=None, verbose=False,
          callback=None):
    """Maximize the expected conditional log probability that ``gen_fn``
    generates ``constraints`` given ``inputs``, where ``(inputs,
    constraints) = data_generator(key)``. Reference: train.jl:25-82.

    Returns the per-epoch held-out score history."""
    if evaluation_size is None:
        evaluation_size = epoch_size
    history = []
    rng = np.random.default_rng(0)
    for epoch in range(num_epoch):
        key, *dkeys = jax.random.split(key, epoch_size + 1)
        epoch_data = [data_generator(k) for k in dkeys]
        for mb in range(num_minibatch):
            idx = rng.permutation(epoch_size)[:minibatch_size]
            objective = 0.0
            for i in idx:
                inputs, constraints = epoch_data[i]
                key, gk = jax.random.split(key)
                trace, weight = gen_fn.generate(gk, inputs, constraints)
                objective += float(weight)
                gen_fn.accumulate_param_gradients(trace)
            update.apply()
            objective /= minibatch_size
            if callback is not None:
                callback(epoch, mb, objective)
        # held-out evaluation
        key, *ekeys = jax.random.split(key, evaluation_size + 1)
        avg_score = 0.0
        for k in ekeys:
            inputs, constraints = data_generator(k)
            key, gk = jax.random.split(key)
            _, weight = gen_fn.generate(gk, inputs, constraints)
            avg_score += float(weight) / evaluation_size
        history.append(avg_score)
        if verbose:
            print(f"epoch {epoch}: est. objective value: {avg_score:.4f}")
    return jnp.asarray(history)


def lecture(key, p: GenerativeFunction, p_args: Tuple,
            q: GenerativeFunction, get_q_args: Callable):
    """Wake-sleep style distillation step (reference train.jl:99-117):
    simulate a trace of p, train q to reproduce its choices."""
    kp, kq = jax.random.split(key)
    p_trace = p.simulate(kp, p_args)
    q_args = get_q_args(p_trace)
    q_trace, score = q.generate(kq, q_args, p_trace.get_choices())
    q.accumulate_param_gradients(q_trace)
    return score


def lecture_batched(key, p: GenerativeFunction, p_args: Tuple,
                    q_batched: GenerativeFunction, get_q_args: Callable,
                    batch_size: int):
    """Batched lecture! (reference train.jl:119-136): q_batched addresses
    training example i under integer namespace i."""
    from ..choice_map import ChoiceMap
    kp, kq = jax.random.split(key)
    keys = jax.random.split(kp, batch_size)
    p_traces = [p.simulate(k, p_args) for k in keys]
    constraints = ChoiceMap()
    for i, tr in enumerate(p_traces):
        constraints.set_submap(i, tr.get_choices())
    q_args = get_q_args(p_traces)
    q_trace, score = q_batched.generate(kq, q_args, constraints)
    q_batched.accumulate_param_gradients(q_trace)
    return score / batch_size
