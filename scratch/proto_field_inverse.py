"""Prototype: recover a transverse ne MAP (21x21 voxel params) from one
shadowgram via adam + smoothness regularisation."""
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.tracer import init_beam

EXT, DIM = 5e-3, 21
d = ScalarDomain(2 * EXT, DIM)
X = d.x[:, None]; Y = d.y[None, :]
true_map = 5e24 * np.exp(-(np.asarray(X)**2 + np.asarray(Y)**2) / 1.5e-3**2)
true_map = jnp.asarray(true_map)
ones_z = jnp.ones(DIM)

def ne_of(map2d):
    return map2d[:, :, None] * ones_z[None, None, :]

d.ne = ne_of(true_map)
s0 = init_beam(jax.random.PRNGKey(0), 30_000, 3.5e-3, 0.0, EXT, "circular")
render = make_renderer(d, s0, bins=(32, 24), K=8)
target = render(ne_of(true_map))

scale = 5e24
def loss_fn(theta):
    m = scale * jax.nn.softplus(theta)      # positive map
    img = render(ne_of(m))
    data = jnp.mean((img - target) ** 2)
    gx = jnp.diff(m, axis=0) / scale
    gy = jnp.diff(m, axis=1) / scale
    reg = jnp.mean(gx**2) + jnp.mean(gy**2)
    return data + 3.0 * reg

theta0 = jnp.full((DIM, DIM), -2.0)   # softplus(-2) ~ 0.13 -> weak uniform
opt = optax.adam(5e-2)
state = opt.init(theta0)
vg = jax.jit(jax.value_and_grad(loss_fn))
theta = theta0
import time; t0 = time.time()
for it in range(300):
    l, g = vg(theta)
    up, state = opt.update(g, state)
    theta = optax.apply_updates(theta, up)
    if it % 50 == 0:
        m = scale * jax.nn.softplus(theta)
        err = float(jnp.linalg.norm(m - true_map) / jnp.linalg.norm(true_map))
        print(f"it {it:4d} loss {float(l):10.5f} relL2 {err:.3f}", flush=True)
m = scale * jax.nn.softplus(theta)
err = float(jnp.linalg.norm(m - true_map) / jnp.linalg.norm(true_map))
print("final relL2:", err, "time", round(time.time()-t0, 1))
