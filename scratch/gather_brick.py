"""Microbench: per-ray (B,B,B,C) slice-gather vs 8-corner row gathers.

Decides whether a brick-hoisted time tracer is viable: if XLA/TPU issues
one descriptor per multi-dim slice start (not B^2/B^3), a brick refetch
every S steps beats per-stage corner gathers by ~10x descriptors.
"""
import sys, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

LOG = "/root/repo/scratch/results_brick.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

D, C = 128, 3
N = 200_000
REPS = 200         # scan iterations to amortize dispatch

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (D, D, D, C), jnp.float32)
flat = table.reshape(D * D * D, C)

def idx_batch(key):
    return jax.random.randint(key, (N, 3), 0, D - 8)

@partial(jax.jit, static_argnames=("B",))
def brick_gather_sum(table, starts, B):
    """scan REPS times: per-row (B,B,B,C) slice gather, reduce."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    def body(acc, k):
        st = (starts + k) % (D - 8)
        out = jax.lax.gather(table, st, dnums, (B, B, B, C),
                             mode="clip")        # (N, B, B, B, C)
        return acc + out.sum(axis=(1, 2, 3, 4)), None
    acc, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.float32),
                          jnp.arange(REPS))
    return acc

@jax.jit
def corner_gather_sum(flat, starts):
    """scan REPS times: 8-corner row gathers (the plain trilinear cost)."""
    def body(acc, k):
        st = (starts + k) % (D - 8)
        base = (st[:, 0] * D + st[:, 1]) * D + st[:, 2]
        s = 0.0
        for off in (0, 1, D, D + 1, D * D, D * D + 1, D * D + D,
                    D * D + D + 1):
            s = s + jnp.take(flat, base + off, axis=0, mode="clip").sum(1)
        return acc + s, None
    acc, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.float32),
                          jnp.arange(REPS))
    return acc

try:
    starts = idx_batch(jax.random.PRNGKey(1))
    for B in (4, 6):
        r = brick_gather_sum(table, starts, B); r.block_until_ready()
        t0 = time.perf_counter()
        r = brick_gather_sum(table, idx_batch(jax.random.PRNGKey(2)), B)
        chk = float(r.sum())          # force full host roundtrip
        t = time.perf_counter() - t0
        log(kind=f"brick_B{B}", s=round(t, 3), chk=chk,
            slices_per_s=round(N * REPS / t),
            gb_per_s=round(N * REPS * B**3 * C * 4 / t / 1e9, 1))
    r = corner_gather_sum(flat, starts); r.block_until_ready()
    t0 = time.perf_counter()
    r = corner_gather_sum(flat, idx_batch(jax.random.PRNGKey(3)))
    chk = float(r.sum())
    t = time.perf_counter() - t0
    log(kind="corners8", s=round(t, 3), chk=chk,
        rows_per_s=round(8 * N * REPS / t))
except Exception as e:  # noqa: BLE001
    log(error=repr(e)[:300])
log(done=True)
