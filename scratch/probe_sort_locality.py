"""Does sorting rays by transverse cell index speed the gather-bound march?

The segmented march gathers 4 corner rows (each (K+1)*C wide) per ray per
segment through the XLA gather engine at ~44-45 GB/s (scratch/
bench_pallas_parts*.py). If that rate is limited by random row access
rather than the engine itself, presenting the gather with SORTED indices
(rays ordered by their (ia,ib) cell) should raise it: consecutive rays
hit identical/adjacent rows.

Sorting is exact: a pure permutation of the bundle; per-ray exit states
are unchanged, detector scatter-add order changes at fp-tolerance only.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 512
RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

# transverse cell index at entry (z-probing: a=x col 0, b=y col 1)
na = nb = DIM
dx = 2 * ext / (DIM - 1)
ia = jnp.clip(jnp.floor((s0[0] + ext) / dx).astype(jnp.int32), 0, na - 2)
ib = jnp.clip(jnp.floor((s0[1] + ext) / dx).astype(jnp.int32), 0, nb - 2)
order = jnp.argsort(ia * nb + ib)
s0_sorted = s0[:, order]
jax.block_until_ready(s0_sorted)

for pdt, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    spack = build_segment_pack_device(dom, K=DIM, dtype=pdt)
    for label, s in (("natural", s0), ("sorted", s0_sorted)):
        def run():
            return pipeline.run(dom, s, spack=spack, solver="zscan_seg",
                                bins=(431, 321), integrator="rk2s2",
                                seg_weights="slab")
        H = run(); H.block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            H = run(); H.block_until_ready()
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(json.dumps({"dim": DIM, "rays": RAYS, "pack": tag,
                          "order": label, "s": round(el, 4),
                          "rays_s": round(RAYS / el, 1),
                          "H_sum": float(np.asarray(H).sum())}),
              flush=True)
