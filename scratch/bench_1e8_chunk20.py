"""1e8 north star, int4 pack, larger outer dispatch chunks.

The 4M-chunk runs (results_1e8_int4.jsonl) pay 25 dispatch round-trips;
the analytic tier measured 14.3 -> 9.83 s going 4M -> 20M outer chunks
(results_analytic_r3.jsonl). Same sweep for the gridded int4 tiers.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, TOTAL = 512, 100_000_000
ext = 5e-3
for integ, chunk in (("rk2s4", 20_000_000), ("rk2s4", 10_000_000),
                     ("rk2s2", 20_000_000)):
    t0 = time.perf_counter()
    dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(dom, K=DIM, dtype="int4", free_ne=True)
    t_pack = time.perf_counter() - t0
    key = jax.random.PRNGKey(0)
    acc = None
    for k in range(TOTAL // chunk):
        s_k = init_beam(jax.random.fold_in(key, k), chunk, 2e-3, 0.0,
                        ext, "circular")
        Hk = pipeline.run(dom, s_k, spack=sp, solver="zscan_seg",
                          bins=(431, 321), critical_guard=None,
                          integrator=integ, seg_weights="slab")
        acc = Hk if acc is None else acc + Hk
    acc.block_until_ready()
    wall = time.perf_counter() - t0
    print(json.dumps({"integ": integ, "pack": "int4", "chunk": chunk,
                      "dim": DIM, "rays": TOTAL,
                      "pack_s": round(t_pack, 2),
                      "wall_s": round(wall, 2),
                      "H_sum": float(acc.sum())}), flush=True)
