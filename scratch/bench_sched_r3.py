"""Round-3b: chunk-size x K sweep for the single-chip segmented march.

Motivation: scratch/bench_pp_overhead.py measured the PP schedule on a
1-device mesh FASTER (-27.8%) than the plain march at equal K=64 — its
only structural difference is much smaller in-flight ray chunks (131k vs
the ~2M auto chunk), shrinking the per-segment corner-gather working
set.  If that is the real cause, the plain march should speed up with a
smaller ray_chunk too.  Sweep ray_chunk and K at the bench config
(512^3 / 4M rays / rk2s2 / weights=slab / bf16 pack).
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM = 512
RAYS = 4_000_000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

def timed(spack, ray_chunk, integ="rk2s2"):
    def run():
        return pipeline.run(dom, s0, spack=spack, solver="zscan_seg",
                            bins=(431, 321), integrator=integ,
                            seg_weights="slab", ray_chunk=ray_chunk)
    H = run(); H.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); H = run(); H.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return RAYS / min(ts), float(jnp.asarray(H).sum())

results = []
for K in (512, 256, 128, 64):
    spack = build_segment_pack_device(dom, K=K, dtype=jnp.bfloat16)
    jax.block_until_ready(spack.seg_planes)
    for chunk in (131072, 262144, 524288, 1048576, None):
        try:
            rate, cks = timed(spack, chunk)
        except Exception as e:
            print(json.dumps({"K": K, "chunk": chunk,
                              "error": repr(e)[:200]}), flush=True)
            continue
        rec = {"K": K, "chunk": chunk, "rk2s2_Mrays_s": round(rate / 1e6, 3),
               "checksum": cks}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    del spack

best = max(results, key=lambda r: r["rk2s2_Mrays_s"])
print("BEST:", json.dumps(best), flush=True)
