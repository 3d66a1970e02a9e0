import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1_000_000
nx = ny = nz = 128
M = nx*ny*nz
table = jax.random.normal(key, (M, 3))
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
         + fx*fy*fz*jnp.take(table, b+ny*nz+nz+1, axis=0, mode='clip'))
    inside = jnp.all((t >= 0) & (t <= nx-1.0), axis=-1)
    return jnp.where(inside[:,None], out, 0.0)

for name, fn in [("N0", jax.jit(lambda tb,p: body(tb, p))),
                 ("N2", jax.jit(lambda tb,p: body(tb, (p-0.0)*1.0)))]:
    txt = fn.lower(table, pos).compile().as_text()
    ops = {}
    for line in txt.splitlines():
        line=line.strip()
        for op in ("gather(", "dynamic-slice(", "fusion(", "while(", "scatter(", "sort(", "copy("):
            if ("= " + op) in line or (" " + op) in line.split("=")[-1][:40]:
                ops[op] = ops.get(op, 0) + 1
    print(name, ops, "len", len(txt), flush=True)
    open(f"/root/repo/scratch/hlo_{name}.txt","w").write(txt)
