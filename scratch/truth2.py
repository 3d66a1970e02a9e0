import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
N = 1_000_000
nx = ny = nz = 128
table = jax.random.normal(key, (nx*ny*nz, 3))
poses = [jax.random.uniform(jax.random.PRNGKey(k), (N,3))*126.0 for k in range(8)]
for p in poses: p.block_until_ready()

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
    return out

K = 64
@jax.jit
def chained(table, pos):
    def step(p, _):
        return p + body(table, p) * 1e-7, None
    p, _ = jax.lax.scan(step, pos, None, length=K)
    return p.sum()   # tiny output: D2H cheap

# warmup/compile on poses[7]
s = chained(table, poses[7]); print("warm:", float(s), flush=True)
for k in range(4):
    t0 = time.perf_counter()
    val = float(chained(table, poses[k]))   # forces full sync to host scalar
    dt = time.perf_counter()-t0
    print(f"fresh input {k}: {dt*1e3:.1f} ms ({N*K/dt/1e6:.0f} M evals/s) val={val:.3f}", flush=True)
# repeat same input
t0 = time.perf_counter(); val = float(chained(table, poses[0])); print("repeat input 0:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
