"""Probe: is the XLA gather engine row-ISSUE-bound or byte-bound?

The segmented march gathers 4 random corner rows per ray (offsets
0, 1, nb, nb+1 into the (na*nb, W) table). b-adjacent corners are
ADJACENT table rows, so a duplicated pair table (row = concat of cell,
cell+1) needs only 2 gather rows/ray, and a quad table 1 row/ray — same
total bytes, 2x/4x the memory. If the engine issues rows at a fixed
rate (the ray-sort falsification suggested issue-bound), pair/quad
layouts buy up to 2x/4x on the march's dominant term.

Measures, on the real chip, for bf16-class (W=3078B) and int4-class
(W=771B) row widths at 262144 rays:
  g4: 4 takes of W-rows      (the production gather)
  g2: 2 takes of 2W-rows     (pair table)
  g1: 1 take  of 4W-rows     (quad table)
plus a dense HBM copy for the bandwidth roofline.
"""
import json
import time

import jax
import jax.numpy as jnp

N = 262_144
na = nb = 512
cells = na * nb


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


key = jax.random.PRNGKey(0)
ia = jax.random.randint(key, (N,), 0, na - 1)
ib = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, nb - 1)
base = ia * nb + ib

results = {}
for tag, K1, C, dt in [("bf16", 512, 3, jnp.bfloat16),
                       ("int8", 512, 3, jnp.int8),
                       ("int4", 256, 3, jnp.int8)]:
    W = (K1 + 1) * C  # row elements
    bytes_per_el = jnp.dtype(dt).itemsize
    seg = jax.random.normal(
        jax.random.fold_in(key, 2), (cells, W), jnp.float32)
    seg = (seg * 10).astype(dt) if dt == jnp.int8 else seg.astype(dt)

    pair = jnp.concatenate(
        [seg, jnp.roll(seg, -1, axis=0)], axis=1)        # (cells, 2W)
    quad = jnp.concatenate(
        [pair, jnp.roll(pair, -nb, axis=0)], axis=1)     # (cells, 4W)

    # MATERIALIZE the gathered corner buffers — this is literally what
    # march_segment does before its slab scan. (A reduced output lets
    # XLA transpose the gather into a per-cell count reduction: the
    # first probe version measured an impossible 37 TB/s that way.)
    @jax.jit
    def g4(seg, base):
        return [jnp.take(seg, base + off, axis=0, mode="clip")
                for off in (0, 1, nb, nb + 1)]

    @jax.jit
    def g2(pair, base):
        return [jnp.take(pair, base + off, axis=0, mode="clip")
                for off in (0, nb)]

    @jax.jit
    def g1(quad, base):
        return jnp.take(quad, base, axis=0, mode="clip")

    total_bytes = N * 4 * W * bytes_per_el
    t4 = bench(g4, seg, base)
    t2 = bench(g2, pair, base)
    t1 = bench(g1, quad, base)
    results[tag] = {
        "row_bytes": W * bytes_per_el,
        "total_MB": round(total_bytes / 1e6, 1),
        "g4_ms": round(t4 * 1e3, 2),
        "g2_ms": round(t2 * 1e3, 2),
        "g1_ms": round(t1 * 1e3, 2),
        "g4_GBs": round(total_bytes / t4 / 1e9, 1),
        "g2_GBs": round(total_bytes / t2 / 1e9, 1),
        "g1_GBs": round(total_bytes / t1 / 1e9, 1),
        "speedup_pair": round(t4 / t2, 2),
        "speedup_quad": round(t4 / t1, 2),
    }
    print(tag, json.dumps(results[tag]))

# dense-copy roofline
big = jnp.zeros((512, 1024, 1024), jnp.float32)
cp = jax.jit(lambda x: x + 1.0)
t = bench(cp, big)
results["dense_copy_GBs"] = round(2 * big.nbytes / t / 1e9, 1)
print("dense r+w roofline GB/s:", results["dense_copy_GBs"])

with open("scratch/results_pair_gather.json", "w") as f:
    json.dump(results, f, indent=1)
