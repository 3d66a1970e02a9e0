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

def corners(table, pos, ncorner, mask=False, clip_arr=False):
    i = jnp.floor(pos).astype(jnp.int32)
    if clip_arr:
        i = jnp.clip(i, 0, jnp.array([nx-2, ny-2, nz-2], dtype=jnp.int32))
    else:
        i = jnp.clip(i, 0, nx-2)
    f = jnp.clip(pos - i, 0.0, 1.0)
    fx, fy, fz = f[:,0:1], f[:,1:2], f[:,2:3]
    gx, gy, gz = 1-fx, 1-fy, 1-fz
    b = (i[:,0]*ny + i[:,1])*nz + i[:,2]
    ws = [gx*gy*gz, gx*gy*fz, gx*fy*gz, gx*fy*fz, fx*gy*gz, fx*gy*fz, fx*fy*gz, fx*fy*fz]
    offs = [(0,0,0),(0,0,1),(0,1,0),(0,1,1),(1,0,0),(1,0,1),(1,1,0),(1,1,1)]
    out = 0.0
    for k in range(ncorner):
        dx,dy,dz = offs[k]
        out = out + ws[k]*jnp.take(table, b + (dx*ny+dy)*nz+dz, axis=0, mode='clip')
    if mask:
        inside = jnp.all((pos >= 0) & (pos <= nx-1.0), axis=-1)
        out = jnp.where(inside[:,None], out, 0.0)
    return out

for nc in (2, 4, 8):
    bench(f"F {nc}-corner tri-weights", jax.jit(lambda t,p,nc=nc: corners(t,p,nc)), table, pos)
bench("H 8-corner + inside mask", jax.jit(lambda t,p: corners(t,p,8,mask=True)), table, pos)
bench("I 8-corner + clip array", jax.jit(lambda t,p: corners(t,p,8,clip_arr=True)), table, pos)
