"""Inverse graphics (lite): infer object pose from a rendered image.

Reference: /root/reference/examples/inverse_graphics (pose inference from
images). Simplified: a differentiable renderer draws a soft square of
unknown position/size/brightness onto a 32x32 image; given a noisy observed
image, HMC recovers the pose. The renderer is pure jnp, so the image
likelihood and its gradients run on the MXU/VPU and thousands of chains
vmap.

Run: python examples/inverse_graphics.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gen_tpu as gt
from gen_tpu import choicemap, gen, select
from gen_tpu.inference import hmc, map_optimize

RES = 32


def render(cx, cy, size, brightness):
    """Soft-edged square sprite, differentiable in all pose parameters."""
    coords = (jnp.arange(RES) + 0.5) / RES
    dx = jnp.abs(coords[None, :] - cx)
    dy = jnp.abs(coords[:, None] - cy)
    sharp = 40.0
    inside = (jax.nn.sigmoid(sharp * (size / 2 - dx))
              * jax.nn.sigmoid(sharp * (size / 2 - dy)))
    return brightness * inside


@gen
def scene_model():
    cx = gt.uniform(0.2, 0.8) @ "cx"
    cy = gt.uniform(0.2, 0.8) @ "cy"
    size = gt.uniform(0.1, 0.5) @ "size"
    brightness = gt.uniform(0.5, 1.5) @ "brightness"
    image = render(cx, cy, size, brightness)
    gt.broadcasted_normal(image, 0.05) @ "image"
    return image


POSE = select("cx", "cy", "size", "brightness")


def main(seed=0):
    rng = np.random.default_rng(seed)
    true_pose = dict(cx=0.62, cy=0.41, size=0.27, brightness=1.1)
    clean = render(**{k: jnp.asarray(v) for k, v in true_pose.items()})
    observed = np.asarray(clean) + 0.05 * rng.standard_normal((RES, RES))
    obs = choicemap(image=jnp.asarray(observed))

    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    trace, _ = scene_model.generate(k0, (), obs)

    # MAP initialization then HMC over the pose
    for _ in range(60):
        trace = map_optimize(trace, POSE, max_step_size=1e-4)

    @jax.jit
    def step(tr, k):
        tr, acc = hmc(k, tr, POSE, L=10, eps=2e-4)
        return tr, (tr["cx"], tr["cy"], tr["size"], tr["brightness"], acc)

    chains = []
    for i in range(300):
        key, sub = jax.random.split(key)
        trace, vals = step(trace, sub)
        chains.append([float(v) for v in vals[:4]])
    est = np.mean(chains[100:], axis=0)
    names = ["cx", "cy", "size", "brightness"]
    for n, e in zip(names, est):
        print(f"{n}: inferred {e:.3f} (true {true_pose[n]})")
    for n, e in zip(names, est):
        assert abs(e - true_pose[n]) < 0.05, (n, e)
    print("inverse_graphics example OK")


if __name__ == "__main__":
    main()
