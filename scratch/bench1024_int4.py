"""1024^3 single-chip with the int4 nibble pack: the 1.6 GB table
(vs 6.4 GB bf16 / 3.2 GB int8) fits HBM whole — full-trace segments,
no per-call batching."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, RAYS = 1024, 4_000_000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
sp = build_segment_pack_device(dom, K=256, dtype="int4", free_ne=True)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")
for integ in ("rk2s2", "rk2s4"):
    def run():
        return pipeline.run(dom, s0, spack=sp, solver="zscan_seg",
                            bins=(431, 321), integrator=integ,
                            seg_weights="slab", critical_guard=None)
    H = run(); H.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        H = run(); H.block_until_ready()
        ts.append(time.perf_counter() - t0)
    el = min(ts)
    print(json.dumps({"dim": DIM, "rays": RAYS, "pack": "int4",
                      "integ": integ, "s": round(el, 3),
                      "rays_s": round(RAYS / el, 1),
                      "H_sum": float(H.sum())}), flush=True)
