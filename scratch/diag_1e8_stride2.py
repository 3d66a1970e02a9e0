"""Per-chunk timing of the 1e8 loop for the int4 stride-2 pack vs the
full int4 pack: which chunk eats the time?"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, CHUNK = 512, 4_000_000
ext = 5e-3
for stride in (2,):
    dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(dom, K=DIM, dtype="int4",
                                   free_ne=True, plane_stride=stride)
    key = jax.random.PRNGKey(0)
    acc = None
    integ = "rk2s2" if stride == 2 else "rk2s4"
    for k in range(25):
        t0 = time.perf_counter()
        s_k = init_beam(jax.random.fold_in(key, k), CHUNK, 2e-3, 0.0,
                        ext, "circular")
        s_k.block_until_ready()
        t1 = time.perf_counter()
        Hk = pipeline.run(dom, s_k, spack=sp, solver="zscan_seg",
                          bins=(431, 321), critical_guard=None,
                          integrator=integ, seg_weights="slab")
        acc = Hk if acc is None else acc + Hk
        acc.block_until_ready()
        t2 = time.perf_counter()
        print(json.dumps({"stride": stride, "k": k,
                          "beam_s": round(t1 - t0, 3),
                          "run_s": round(t2 - t1, 3)}), flush=True)
