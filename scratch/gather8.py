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
table = jax.random.normal(key, (M, 3))
pos = jax.random.uniform(key, (N,3))*126.0
origin_arr = jnp.zeros(3); inv_arr = jnp.ones(3)

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

bench("N0 body(pos) raw", jax.jit(lambda tb,p: body(tb, p)), table, pos)
bench("N1 body((pos-origin_arr)*inv_arr)", jax.jit(lambda tb,p: body(tb, (p-origin_arr)*inv_arr)), table, pos)
bench("N2 body((pos-0.0)*1.0 scalar)", jax.jit(lambda tb,p: body(tb, (p-0.0)*1.0)), table, pos)
o3 = jnp.array([0.1,0.2,0.3]); i3 = jnp.array([1.1,1.2,1.3])
bench("N3 body((pos-o3)*i3) nontrivial const arr", jax.jit(lambda tb,p: body(tb, (p-o3)*i3)), table, pos)
