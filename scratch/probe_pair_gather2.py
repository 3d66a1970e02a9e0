"""Probe v2: is the XLA gather engine row-ISSUE-bound or byte-bound?

v1 (probe_pair_gather.py) was invalidated: block_until_ready no longer
synchronizes on the axon remote platform (a 1 GB dense copy "measured"
0.07 ms = 30 TB/s).  v2 chains R identical gathers inside ONE jit with
lax.optimization_barrier between them (prevents CSE and gather->reduce
fusion), reduces each materialized output to a scalar, and syncs once
via a host fetch of the accumulator; per-op time = total/R with the
RPC/fetch overhead amortized.  Validation anchor: the production g4
bf16 gather at 262k rays measured 71 ms standalone in round 3b
(bench_pallas_parts).

Question: b-adjacent corners are ADJACENT table rows, so a duplicated
pair table (row = cell ++ cell+1) needs 2 gather rows/ray and a quad
table 1 row/ray -- same useful bytes, 2x/4x table memory.  If the
engine is issue-bound, pair/quad buys up to 2x/4x on the march's
dominant term.
"""
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

N = 262_144
na = nb = 512
cells = na * nb
R = 8

key = jax.random.PRNGKey(0)
ia = jax.random.randint(key, (N,), 0, na - 1)
ib = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, nb - 1)
base = ia * nb + ib


def timed(fn, *args):
    out = fn(*args)
    _ = float(out)                      # warm + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out)                  # host fetch = real sync
        ts.append(time.perf_counter() - t0)
    return min(ts) / R


def make_bench(offs, table):
    """R barrier-separated rounds of len(offs) row-gathers."""
    @jax.jit
    def fn(table, base):
        acc = jnp.float32(0.0)
        for r in range(R):
            b = lax.optimization_barrier(base + (r & 0))
            for off in offs:
                g = jnp.take(table, b + off, axis=0, mode="clip")
                g = lax.optimization_barrier(g)   # must materialize
                acc = acc + g[0, 0].astype(jnp.float32)
        return acc
    return lambda: timed(fn, table, base)


results = {}
for tag, K1, dt in [("bf16", 513, jnp.bfloat16),
                    ("int8", 513, jnp.int8),
                    ("int4", 257, jnp.int8)]:
    W = K1 * 3
    bytes_per_el = jnp.dtype(dt).itemsize
    seg = jax.random.normal(
        jax.random.fold_in(key, 2), (cells, W), jnp.float32)
    seg = (seg * 10).astype(dt) if dt == jnp.int8 else seg.astype(dt)

    pair = jnp.concatenate([seg, jnp.roll(seg, -1, axis=0)], axis=1)
    quad = jnp.concatenate([pair, jnp.roll(pair, -nb, axis=0)], axis=1)

    t4 = make_bench((0, 1, nb, nb + 1), seg)()
    t2 = make_bench((0, nb), pair)()
    t1 = make_bench((0,), quad)()

    total_bytes = N * 4 * W * bytes_per_el
    results[tag] = {
        "row_bytes": W * bytes_per_el,
        "useful_MB": round(total_bytes / 1e6, 1),
        "g4_ms": round(t4 * 1e3, 2),
        "g2_ms": round(t2 * 1e3, 2),
        "g1_ms": round(t1 * 1e3, 2),
        "g4_GBs": round(total_bytes / t4 / 1e9, 1),
        "g2_GBs": round(total_bytes / t2 / 1e9, 1),
        "g1_GBs": round(total_bytes / t1 / 1e9, 1),
        "speedup_pair": round(t4 / t2, 2),
        "speedup_quad": round(t4 / t1, 2),
    }
    print(tag, json.dumps(results[tag]), flush=True)

# dense-copy roofline with the same methodology
big = jnp.zeros((256, 1024, 1024), jnp.float32)


@jax.jit
def dense(x):
    acc = jnp.float32(0.0)
    for _ in range(R):
        x = lax.optimization_barrier(x + 1.0)
        acc = acc + x[0, 0, 0]
    return acc


t = timed(dense, big)
results["dense_copy_GBs"] = round(2 * big.nbytes / t / 1e9, 1)
print("dense r+w roofline GB/s:", results["dense_copy_GBs"])

with open("scratch/results_pair_gather2.json", "w") as f:
    json.dump(results, f, indent=1)
