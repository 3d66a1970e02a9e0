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
o3 = jnp.array([0.1,0.2,0.3]); i3 = jnp.array([1.1,1.2,1.3])

def weighted8(table, b, fx, fy, fz, inside):
    gx, gy, gz = 1-fx, 1-fy, 1-fz
    out = (gx*gy*gz*jnp.take(table, b, axis=0, mode='clip')
         + gx*gy*fz*jnp.take(table, b+1, axis=0, mode='clip')
         + gx*fy*gz*jnp.take(table, b+nz, axis=0, mode='clip')
         + gx*fy*fz*jnp.take(table, b+nz+1, axis=0, mode='clip')
         + fx*gy*gz*jnp.take(table, b+ny*nz, axis=0, mode='clip')
         + fx*gy*fz*jnp.take(table, b+ny*nz+1, axis=0, mode='clip')
         + fx*fy*gz*jnp.take(table, b+ny*nz+nz, axis=0, mode='clip')
         + fx*fy*fz*jnp.take(table, b+ny*nz+nz+1, axis=0, mode='clip'))
    return jnp.where(inside[:,None], out, 0.0)

def derive(t):
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, nx-2)
    f = jnp.clip(t - i, 0.0, 1.0)
    b = (i[:,0]*ny + i[:,1])*nz + i[:,2]
    inside = jnp.all((t >= 0) & (t <= nx-1.0), axis=-1)
    return b, f[:,0:1], f[:,1:2], f[:,2:3], inside

@jax.jit
def P1(table, pos):
    t = jax.lax.optimization_barrier((pos - o3) * i3)
    return weighted8(table, *derive(t))
bench("P1 barrier on transformed pos", P1, table, pos)

@jax.jit
def P2(table, pos):
    t = (pos - o3) * i3
    b, fx, fy, fz, inside = jax.lax.optimization_barrier(derive(t))
    return weighted8(table, b, fx, fy, fz, inside)
bench("P2 barrier on (idx, weights)", P2, table, pos)

# P3: inside a scan (like the tracer) with barrier on derived
@jax.jit
def P3(table, pos):
    def step(c, _):
        t = (pos - o3) * i3 + c*1e-9
        b, fx, fy, fz, inside = jax.lax.optimization_barrier(derive(t))
        v = weighted8(table, b, fx, fy, fz, inside)
        return c + v[:, :1].sum()*0.0 + 1.0, None
    c, _ = jax.lax.scan(step, jnp.float32(0), None, length=8)
    return c
bench("P3 scan x8 with barrier (per-step)", P3, table, pos)
