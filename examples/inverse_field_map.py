"""Full-FIELD inversion: recover a voxel density map from one shadowgram.

Beyond parameter fitting (inverse_shadowgraphy.py): optimise a FREE
21 x 21 transverse electron-density map (441 voxels, z-uniform column)
against a single target shadowgram, with adam + a smoothness prior.
The adjoint of the whole forward model (pack build -> segmented march ->
optics -> CIC detector, synthpy_tpu.inverse with segment-granularity
remat) makes d(loss)/d(voxel) one reverse pass.

Measured (CPU, 300 adam steps, 30k rays): relative L2 error 9.4% over
the full map, 4.8% inside the beam-sampled region (r < 3.2 mm) —
scratch/field_inverse_map.npy holds a recovered map.

Notes that matter for reproductions:
* optimise the NORMALIZED map (ne/scale) — f32 norms of 1e24-scale
  fields overflow;
* softplus keeps the map positive without constrained optimisation;
* the smoothness prior fills the null space (z-structure and the
  unsampled corners are unconstrained by a single projection).

Usage: python examples/inverse_field_map.py [rays] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.tracer import init_beam

RAYS = int(float(sys.argv[1])) if len(sys.argv) > 1 else 30_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 300

EXT, DIM = 5e-3, 21
SCALE = 5e24

domain = ScalarDomain(2 * EXT, DIM)
X = domain.x[:, None]
Y = domain.y[None, :]
true_n = jnp.exp(-(X**2 + Y**2) / 1.5e-3**2)    # normalized truth
ones_z = jnp.ones(DIM)


def ne_of(norm_map):
    return (SCALE * norm_map)[:, :, None] * ones_z[None, None, :]


domain.ne = ne_of(true_n)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 3.5e-3, 0.0, EXT, "circular")
render = make_renderer(domain, s0, bins=(32, 24), K=8)
target = render(ne_of(true_n))


def loss_fn(theta):
    mn = jax.nn.softplus(theta)
    img = render(ne_of(mn))
    gx = jnp.diff(mn, axis=0)
    gy = jnp.diff(mn, axis=1)
    return (jnp.mean((img - target) ** 2)
            + 3.0 * (jnp.mean(gx**2) + jnp.mean(gy**2)))


vg = jax.jit(jax.value_and_grad(loss_fn))
opt = optax.adam(5e-2)
theta = jnp.full((DIM, DIM), -2.0)              # weak uniform start
state = opt.init(theta)
t0 = time.perf_counter()
for it in range(ITERS):
    loss, g = vg(theta)
    up, state = opt.update(g, state)
    theta = optax.apply_updates(theta, up)
    if it % 50 == 0:
        mn = jax.nn.softplus(theta)
        err = float(jnp.linalg.norm(mn - true_n)
                    / jnp.linalg.norm(true_n))
        print(f"it {it:4d}  loss {float(loss):8.4f}  relL2 {err:.3f}",
              flush=True)

mn = np.asarray(jax.nn.softplus(theta))
tn = np.asarray(true_n)
R = np.sqrt(np.asarray(X) ** 2 + np.asarray(Y) ** 2)
sel = R < 3.2e-3
err = float(np.linalg.norm(mn - tn) / np.linalg.norm(tn))
errb = float(np.linalg.norm((mn - tn)[sel]) / np.linalg.norm(tn[sel]))
print(f"\nrecovered {DIM}x{DIM} map in {time.perf_counter() - t0:.0f} s: "
      f"relL2 {err:.3f} full, {errb:.3f} beam-sampled")
