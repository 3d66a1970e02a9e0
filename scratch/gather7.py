import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp

def bench(name, fn, *args, n=5):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms (compile {tc:.1f}s)", flush=True)

key = jax.random.PRNGKey(0)
N = 1_000_000
nx = ny = nz = 128
M = nx*ny*nz
pack4d = jax.random.normal(key, (nx,ny,nz,3))
pos = jax.random.uniform(key, (N,3))*126.0
origin_a = jnp.zeros(3); inv_a = jnp.ones(3)

def tri_like(values, pos, origin, inv_spacing, barrier=False):
    nx, ny, nz, C = values.shape
    dims = jnp.array([nx, ny, nz], dtype=pos.dtype)
    t = (pos - origin) * inv_spacing
    inside = jnp.all((t >= 0.0) & (t <= dims - 1.0), axis=-1)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                 jnp.array([nx-2, ny-2, nz-2], dtype=jnp.int32))
    f = jnp.clip(t - i.astype(pos.dtype), 0.0, 1.0)
    ix, iy, iz = i[:,0], i[:,1], i[:,2]
    fx, fy, fz = f[:,0:1], f[:,1:2], f[:,2:3]
    gx, gy, gz = 1-fx, 1-fy, 1-fz
    flat = values.reshape(nx*ny*nz, C)
    if barrier:
        flat = jax.lax.optimization_barrier(flat)
    base = (ix*ny + iy)*nz + iz
    out = (gx*gy*gz*jnp.take(flat, base, axis=0, mode='clip')
         + gx*gy*fz*jnp.take(flat, base+1, axis=0, mode='clip')
         + gx*fy*gz*jnp.take(flat, base+nz, axis=0, mode='clip')
         + gx*fy*fz*jnp.take(flat, base+nz+1, axis=0, mode='clip')
         + fx*gy*gz*jnp.take(flat, base+ny*nz, axis=0, mode='clip')
         + fx*gy*fz*jnp.take(flat, base+ny*nz+1, axis=0, mode='clip')
         + fx*fy*gz*jnp.take(flat, base+ny*nz+nz, axis=0, mode='clip')
         + fx*fy*fz*jnp.take(flat, base+ny*nz+nz+1, axis=0, mode='clip'))
    return jnp.where(inside[:,None], out, 0.0)

bench("L tri 4D arg + flat barrier", jax.jit(lambda v,p: tri_like(v,p,origin_a,inv_a,barrier=True)), pack4d, pos)

# also: pass pre-flattened 2D arg to the same function body
flat2d = pack4d.reshape(M,3)
def tri_flat(flat, pos, origin, inv_spacing):
    return tri_like(flat.reshape(nx,ny,nz,3), pos, origin, inv_spacing)
bench("M tri with 2D arg reshaped to 4D and back", jax.jit(lambda v,p: tri_flat(v,p,origin_a,inv_a)), flat2d, pos)
