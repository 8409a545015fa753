"""Goal inference from observed motion via sequential Monte Carlo.

Reference: /root/reference/examples/planning/filtering.jl (837 LoC: infer an
agent's destination from a partially observed path, filtering with SMC).
Simplified here: the agent walks noisily toward a latent destination; as
noisy position observations arrive, the particle filter posterior over the
destination sharpens. The whole filter is one jitted program (UnfoldArena).

Run: python examples/smc_planning.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import gen
from gen_tpu.combinators import UnfoldArena
from gen_tpu.inference import ParticleFilterState, maybe_resample

SPEED = 0.15
OBS_STD = 0.05
STEP_STD = 0.03


def simulate_path(T, dest, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.array([0.1, 0.1])
    obs = []
    for _ in range(T):
        d = dest - pos
        dist = np.linalg.norm(d) + 1e-6
        pos = pos + min(SPEED, dist) * d / dist + STEP_STD * rng.standard_normal(2)
        obs.append(pos + OBS_STD * rng.standard_normal(2))
    return np.asarray(obs)


@gen
def model_kernel(t, state):
    """First step draws the destination; later steps walk toward it."""
    # arena requires one kernel; draw dest at every step but gate it:
    # only the t=0 draw enters the state (later draws are fresh prior
    # samples that do not affect the likelihood — pure noise slots).
    dest_draw = gt.uniform(jnp.zeros(2), 1.0) @ "dest"
    pos = jnp.where(t == 0, jnp.array([0.1, 0.1]), state[:2])
    dest = jnp.where(t == 0, dest_draw, state[2:])
    direction = dest - pos
    dist = jnp.linalg.norm(direction) + 1e-6
    step = jnp.where(t == 0, 0.0, jnp.minimum(SPEED, dist)) * direction / dist
    new_pos = gt.broadcasted_normal(pos + step, STEP_STD) @ "pos"
    gt.broadcasted_normal(new_pos, OBS_STD) @ "obs"
    return jnp.concatenate([new_pos, dest])


def main(T=14, n_particles=3000, seed=0):
    true_dest = np.array([0.85, 0.7])
    obs_path = simulate_path(T, true_dest, seed)

    arena = UnfoldArena(model_kernel, max_length=T + 1)
    key = jax.random.PRNGKey(seed)

    key, k0 = jax.random.split(key)
    obs0 = gt.ChoiceMap().set_value("obs", jnp.array([0.1, 0.1]))
    init_keys = jax.random.split(k0, n_particles)
    traces, weights = jax.vmap(
        lambda k: arena.init(k, jnp.zeros(4), (), obs0))(init_keys)
    state = ParticleFilterState(traces, weights, jnp.asarray(0.0))

    @jax.jit
    def smc_step(key, state, obs_t):
        k_res, k_ext = jax.random.split(key)
        state, _ = maybe_resample(k_res, state)
        ext_keys = jax.random.split(k_ext, n_particles)
        cons = gt.ChoiceMap().set_value("obs", obs_t)
        new_traces, ws = jax.vmap(
            lambda kk, tr: arena.extend(kk, tr, cons))(ext_keys, state.traces)
        return ParticleFilterState(new_traces, state.log_weights + ws,
                                   state.log_ml_est)

    def dest_posterior_mean(state):
        dests = state.traces.subtraces.get_choices()["dest"][:, 0, :]
        w = jax.nn.softmax(state.log_weights)
        return np.asarray(jnp.sum(dests * w[:, None], axis=0))

    errors = []
    for t in range(T):
        key, sub = jax.random.split(key)
        state = smc_step(sub, state, jnp.asarray(obs_path[t]))
        est = dest_posterior_mean(state)
        errors.append(float(np.linalg.norm(est - true_dest)))

    print(f"destination posterior mean after  3 obs: err={errors[2]:.3f}")
    print(f"destination posterior mean after {T} obs: err={errors[-1]:.3f}")
    assert errors[-1] < errors[2], (errors[2], errors[-1])
    assert errors[-1] < 0.12, errors[-1]
    print("smc_planning example OK: goal inference sharpens with evidence")


if __name__ == "__main__":
    main()
