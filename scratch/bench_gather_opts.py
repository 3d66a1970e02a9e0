"""Gather-side levers: sorted indices, paired/quadded corner tables.

The march is gather-bound: 4 random 3KB-row reads per ray (12KB/ray,
~45GB/s measured through the XLA gather engine). Test whether
  M. SORTING rays by cell index (locality: runs of equal/adjacent rows)
  P. a PRE-PAIRED table (rows i,i+1 concatenated -> 2 descriptors/ray)
  Q. a PRE-QUADDED table (all 4 corner rows -> 1 descriptor of 12KB)
speed the gather, at identical gathered bytes.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, N = 512, 262144
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
spack = build_segment_pack_device(dom, K=DIM, dtype=jnp.bfloat16)
K = spack.K
C = spack.seg_planes.shape[-1] // (K + 1)
na, nb = spack.shape_ab
seg = spack.seg_planes[0]
origin_ab, inv_ab = spack.origin_ab, spack.inv_spacing_ab
rows = (K + 1) * C

s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, ext, "circular")
u = jnp.stack([s0[0], s0[1], s0[3], s0[4], s0[5], s0[6], s0[7], s0[8]],
              axis=1).astype(jnp.float32)

ta = (u[:, 0] - origin_ab[0]) * inv_ab[0]
tb = (u[:, 1] - origin_ab[1]) * inv_ab[1]
ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
base = ia0 * nb + ib0
base_sorted = jnp.sort(base)
perm = jnp.argsort(base)


@jax.jit
def take4(idx, seg):
    return tuple(jnp.take(seg, idx + off, axis=0, mode="clip")
                 for off in (0, 1, nb, nb + 1))


def bench(fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


t0_ = bench(take4, base, seg)
print(json.dumps({"variant": "baseline_take4_random",
                  "ms": round(t0_*1e3, 2),
                  "GBps": round(4*N*rows*2/t0_/1e9, 1)}), flush=True)

tM = bench(take4, base_sorted, seg)
print(json.dumps({"variant": "M_take4_sorted", "ms": round(tM*1e3, 2),
                  "GBps": round(4*N*rows*2/tM/1e9, 1)}), flush=True)


@jax.jit
def sort_take4_unsort(base, seg):
    p = jnp.argsort(base)
    bs = base[p]
    cs = take4(bs, seg)
    return cs, p


tM2 = bench(sort_take4_unsort, base, seg)
print(json.dumps({"variant": "M2_sort_then_take4",
                  "ms": round(tM2*1e3, 2)}), flush=True)

# paired table: rows i and i+1 concatenated
seg_pair = jnp.concatenate([seg, jnp.roll(seg, -1, axis=0)], axis=1)
jax.block_until_ready(seg_pair)


@jax.jit
def take2_paired(idx, sp):
    return tuple(jnp.take(sp, idx + off, axis=0, mode="clip")
                 for off in (0, nb))


tP = bench(take2_paired, base, seg_pair)
print(json.dumps({"variant": "P_take2_paired", "ms": round(tP*1e3, 2)}),
      flush=True)
tPs = bench(take2_paired, base_sorted, seg_pair)
print(json.dumps({"variant": "P_take2_paired_sorted",
                  "ms": round(tPs*1e3, 2)}), flush=True)

# quadded table: all 4 corner rows as one row
seg_quad = jnp.concatenate(
    [seg, jnp.roll(seg, -1, axis=0),
     jnp.roll(seg, -nb, axis=0), jnp.roll(seg, -(nb + 1), axis=0)],
    axis=1)
jax.block_until_ready(seg_quad)


@jax.jit
def take1_quad(idx, sq):
    return jnp.take(sq, idx, axis=0, mode="clip")


tQ = bench(take1_quad, base, seg_quad)
print(json.dumps({"variant": "Q_take1_quad", "ms": round(tQ*1e3, 2)}),
      flush=True)
tQs = bench(take1_quad, base_sorted, seg_quad)
print(json.dumps({"variant": "Q_take1_quad_sorted",
                  "ms": round(tQs*1e3, 2)}), flush=True)
