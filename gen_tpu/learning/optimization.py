"""Parameter-update abstraction (gradient ASCENT on trace log-probability).

Reference: /root/reference/src/optimization.jl + builtin_optimization.jl.
Update configurations: ``FixedStepGradientDescent``, ``GradientDescent``
(1/t decay), ``ADAM`` (declared but unimplemented in the reference snapshot,
optimization.jl:99-105 — implemented here), plus an ``Optax`` bridge that
wraps any optax GradientTransformation.

``ParamUpdate(conf, fns...)`` holds per-gen-fn optimizer state; ``apply()``
consumes the gradient accumulators (``fn.params_grad``), steps the params,
and zeroes the accumulators — matching the reference's ``apply!`` loop
(builtin_optimization.jl:70-120)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FixedStepGradientDescent:
    """conf: θ += step_size * ∇ (reference optimization.jl:75-82)."""

    def __init__(self, step_size: float):
        self.step_size = step_size

    def init(self, params):
        return ()

    def step(self, state, params, grads):
        new = jax.tree_util.tree_map(
            lambda p, g: p + self.step_size * g, params, grads)
        return (), new


class GradientDescent:
    """conf: θ += a/(b+t-1) * ∇ with 1/t decay (reference
    optimization.jl:84-97, builtin_optimization.jl:93-120)."""

    def __init__(self, step_size_init: float, step_size_beta: float):
        self.step_size_init = step_size_init
        self.step_size_beta = step_size_beta

    def init(self, params):
        return 1

    def step(self, t, params, grads):
        step_size = (self.step_size_init * (self.step_size_beta + 1.0)
                     / (self.step_size_beta + t))
        new = jax.tree_util.tree_map(
            lambda p, g: p + step_size * g, params, grads)
        return t + 1, new


class ADAM:
    """conf: Adam ascent (declared at reference optimization.jl:99-105;
    init_update_state was left unimplemented there)."""

    def __init__(self, learning_rate=1e-3, beta1=0.9, beta2=0.999,
                 epsilon=1e-8):
        self.lr, self.b1, self.b2, self.eps = (learning_rate, beta1, beta2,
                                               epsilon)

    def init(self, params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return (zeros, jax.tree_util.tree_map(jnp.zeros_like, params), 1)

    def step(self, state, params, grads):
        m, v, t = state
        m = jax.tree_util.tree_map(
            lambda m_, g: self.b1 * m_ + (1 - self.b1) * g, m, grads)
        v = jax.tree_util.tree_map(
            lambda v_, g: self.b2 * v_ + (1 - self.b2) * g * g, v, grads)

        def upd(p, m_, v_):
            mhat = m_ / (1 - self.b1 ** t)
            vhat = v_ / (1 - self.b2 ** t)
            return p + self.lr * mhat / (jnp.sqrt(vhat) + self.eps)

        new = jax.tree_util.tree_map(upd, params, m, v)
        return (m, v, t + 1), new


class Optax:
    """Bridge to any optax GradientTransformation (minimizers — grads are
    negated for ascent)."""

    def __init__(self, tx):
        self.tx = tx

    def init(self, params):
        return self.tx.init(params)

    def step(self, state, params, grads):
        neg = jax.tree_util.tree_map(lambda g: -g, grads)
        updates, state = self.tx.update(neg, state, params)
        import optax
        return state, optax.apply_updates(params, updates)


class ParamUpdate:
    """Holds optimizer state for the params of one or more gen fns
    (reference: optimization.jl:33-73)."""

    def __init__(self, conf, *gen_fns):
        self.conf = conf
        self.targets = []
        for fn in gen_fns:
            if isinstance(fn, dict):
                for f, names in fn.items():
                    self.targets.append((f, tuple(names)))
            else:
                self.targets.append((fn, tuple(fn.params.keys())))
        self.states = [
            conf.init({n: fn.params[n] for n in names})
            for fn, names in self.targets]
        self._jitted_step = jax.jit(
            lambda state, params, grads: self.conf.step(state, params, grads))

    def apply(self):
        """Consume gradient accumulators, step params, zero accumulators
        (reference apply!, optimization.jl:66-73)."""
        for i, (fn, names) in enumerate(self.targets):
            params = {n: fn.params[n] for n in names}
            grads = {}
            for n in names:
                g = fn.params_grad.get(n)
                grads[n] = (jax.tree_util.tree_map(jnp.zeros_like, params[n])
                            if g is None else g)
            self.states[i], new_params = self._jitted_step(
                self.states[i], params, grads)
            for n in names:
                fn.params[n] = new_params[n]
                fn.params_grad[n] = None


def apply_update(update: ParamUpdate):
    update.apply()
