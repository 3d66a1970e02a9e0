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
pack4d = table.reshape(nx,ny,nz,3)
idx = jax.random.randint(key, (N,), 0, M-10)
pos = jax.random.uniform(key, (N,3))*126.0
w = jax.random.uniform(key, (N,1))

@jax.jit
def A(table, pos):
    i = jnp.floor(pos).astype(jnp.int32)
    b = (i[:,0]*ny + i[:,1])*nz + i[:,2]
    return jnp.take(table, b, axis=0, mode='clip')
bench("A float->int idx", A, table, pos)

@jax.jit
def B(table, idx, w):
    return jnp.take(table, idx, axis=0, mode='clip') * w
bench("B gather*weight", B, table, idx, w)

@jax.jit
def Cf(pack4d, idx):
    flat = pack4d.reshape(M, 3)
    return jnp.take(flat, idx, axis=0, mode='clip')
bench("C reshape4d gather", Cf, pack4d, idx)

@jax.jit
def D(table, idx, w):
    return w*jnp.take(table, idx, axis=0, mode='clip') + (1-w)*jnp.take(table, idx+1, axis=0, mode='clip')
bench("D 2-corner weighted", D, table, idx, w)

@jax.jit
def E(table, pos, w):
    i = jnp.floor(pos).astype(jnp.int32)
    f = pos - i
    b = (i[:,0]*ny + i[:,1])*nz + i[:,2]
    fx = f[:,0:1]
    return fx*jnp.take(table, b, axis=0, mode='clip') + (1-fx)*jnp.take(table, b+1, axis=0, mode='clip')
bench("E float idx + 2-corner weighted", E, table, pos, w)
