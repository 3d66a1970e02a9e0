"""Is the XLA gather engine row-COUNT-bound or row-BYTE-bound?
The march does 4 corner-row gathers/ray; packing the 2x2 neighborhood
into ONE 4x-wide row (4x pack memory) would quarter the row count at
equal bytes. Only worth building if rows/s, not bytes/s, is the limit."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

N_ROWS = 262_144          # 512^2 cells
N_RAYS = 262_144
key = jax.random.PRNGKey(0)
for W in (772, 1544, 3088):   # ~(K/2+1)*C int4 / x2 / x4(bf16-class)
    tbl = jax.random.randint(key, (N_ROWS, W), -128, 127, jnp.int8)
    idx = jax.random.randint(key, (N_RAYS,), 0, N_ROWS - 513, jnp.int32)

    @jax.jit
    def four_takes(tbl, idx):
        acc = jnp.zeros((N_RAYS,), jnp.int32)
        for off in (0, 1, 512, 513):
            r = jnp.take(tbl, idx + off, axis=0, mode="clip")
            acc = acc + r.astype(jnp.int32).sum(axis=1)
        return acc

    @jax.jit
    def one_take(tbl, idx):
        r = jnp.take(tbl, idx, axis=0, mode="clip")
        return 4 * r.astype(jnp.int32).sum(axis=1)

    for name, fn, nb in (("4xW", four_takes, 4 * W),
                         ("1xW", one_take, W)):
        o = fn(tbl, idx); o.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = fn(tbl, idx); o.block_until_ready()
            ts.append(time.perf_counter() - t0)
        el = min(ts)
        print(json.dumps({"W": W, "mode": name, "ms": round(el * 1e3, 2),
                          "GBps": round(N_RAYS * nb / el / 1e9, 1),
                          "Mrows_s": round(N_RAYS * (4 if name == "4xW" else 1) / el / 1e6, 1)}),
              flush=True)
