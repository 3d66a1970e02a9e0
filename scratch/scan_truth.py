import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1_000_000
nx = ny = nz = 128
table = jax.random.normal(key, (nx*ny*nz, 3))
pos = jax.random.uniform(key, (N,3))*126.0

def body(table, t):
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, nx-2)
    f = jnp.clip(t - i, 0.0, 1.0)
    ix, iy, iz = i[:,0], i[:,1], i[:,2]
    fx, fy, fz = f[:,0:1], f[:,1:2], f[:,2:3]
    gx, gy, gz = 1-fx, 1-fy, 1-fz
    b = (ix*ny + iy)*nz + iz
    out = (gx*gy*gz*jnp.take(table, b, axis=0, mode='clip')
         + gx*gy*fz*jnp.take(table, b+1, axis=0, mode='clip')
         + gx*fy*gz*jnp.take(table, b+nz, axis=0, mode='clip')
         + gx*fy*fz*jnp.take(table, b+nz+1, axis=0, mode='clip')
         + fx*gy*gz*jnp.take(table, b+ny*nz, axis=0, mode='clip')
         + fx*gy*fz*jnp.take(table, b+ny*nz+1, axis=0, mode='clip')
         + fx*fy*gz*jnp.take(table, b+ny*nz+nz, axis=0, mode='clip')
         + fx*fy*fz*jnp.take(table, b+ny*nz+nz+1, axis=0, mode='clip'))
    inside = jnp.all((t >= 0) & (t <= nx-1.0), axis=-1)
    return jnp.where(inside[:,None], out, 0.0)

K = 64
@jax.jit
def chained(table, pos):
    def step(p, _):
        v = body(table, p)
        return p + v * 1e-7, None
    p, _ = jax.lax.scan(step, pos, None, length=K)
    return p

t0=time.perf_counter(); out = chained(table, pos); jax.block_until_ready(out)
print("compile+run:", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(3): out = chained(table, pos)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3
print(f"scan {K} evals of 1e6-pt trilinear: {dt*1e3:.1f} ms -> {N*K/dt/1e6:.1f} M evals/s", flush=True)
