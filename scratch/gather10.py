import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1_000_000
nx = ny = nz = 128
M = nx*ny*nz
table = jax.random.normal(key, (M, 3))
# five DIFFERENT position arrays
poses = [jax.random.uniform(jax.random.PRNGKey(k), (N,3))*126.0 for k in range(5)]

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

f = jax.jit(lambda tb,p: body(tb,p))
out = f(table, poses[0]); jax.block_until_ready(out)

# varying inputs
t0 = time.perf_counter()
for k in range(10):
    out = f(table, poses[k % 5])
jax.block_until_ready(out)
print("N0 varying inputs:", (time.perf_counter()-t0)/10*1e3, "ms", flush=True)

# repeated same input
t0 = time.perf_counter()
for k in range(10):
    out = f(table, poses[0])
jax.block_until_ready(out)
print("N0 repeated input:", (time.perf_counter()-t0)/10*1e3, "ms", flush=True)
