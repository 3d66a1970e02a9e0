"""1e8-ray 512^3 end-to-end north star on plane-decimated int4 packs:
stride-2 + rk2s2 (BIT-identical to the rk2s4 full-pack tier, half the
gather bytes) and stride-4 + rk2s2 (effective-stride-8 preview tier)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, CHUNK, TOTAL = 512, 4_000_000, 100_000_000
ext = 5e-3
for stride in (2, 4):
    t0 = time.perf_counter()
    dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(dom, K=DIM, dtype="int4",
                                   free_ne=True, plane_stride=stride)
    key = jax.random.PRNGKey(0)
    acc = None
    for k in range(TOTAL // CHUNK):
        s_k = init_beam(jax.random.fold_in(key, k), CHUNK, 2e-3, 0.0,
                        ext, "circular")
        Hk = pipeline.run(dom, s_k, spack=sp, solver="zscan_seg",
                          bins=(431, 321), critical_guard=None,
                          integrator="rk2s2", seg_weights="slab")
        acc = Hk if acc is None else acc + Hk
        # block per chunk: 25 async-enqueued chunks measured 10-18x
        # slower end-to-end on the tunnel runtime (185-286 s vs the
        # 0.40 s/chunk steady state, scratch/diag_1e8_stride2.py) —
        # runahead pathology, not march throughput
        acc.block_until_ready()
    acc.block_until_ready()
    wall = time.perf_counter() - t0
    print(json.dumps({"integ": "rk2s2", "pack": "int4",
                      "plane_stride": stride, "dim": DIM, "rays": TOTAL,
                      "wall_s": round(wall, 2),
                      "H_sum": float(acc.sum())}), flush=True)
