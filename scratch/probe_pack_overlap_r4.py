"""Round-4 item 2: where does the north star's pack_s go, and does
overlapping the pack build with the first chunks help?

Decomposition at the north-star config (512^3, int4, K=512):
  A. build dispatch time (call returns; host trace + remote dispatch)
  B. build ready time (device exec + RPC)
  C. first-chunk march time (trace + compile-cache + exec)
  D. steady-state chunk time
Then two end-to-end 1e8 modes in the SAME session (warm compile both):
  serial:  build -> block -> march chunks
  overlap: build (no block) -> march chunks immediately
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, CHUNK, TOTAL = 512, 4_000_000, 100_000_000
ext = 5e-3
log = open("/root/repo/scratch/results_pack_overlap_r4.jsonl", "a")

def emit(**kw):
    print(json.dumps(kw), flush=True)
    log.write(json.dumps(kw) + "\n"); log.flush()

# ---- decomposition --------------------------------------------------------
t0 = time.perf_counter()
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
t_field = time.perf_counter() - t0

t0 = time.perf_counter()
sp = build_segment_pack_device(dom, K=DIM, dtype="int4", free_ne=True)
t_dispatch = time.perf_counter() - t0
jax.block_until_ready(sp.seg_planes)
t_ready = time.perf_counter() - t0

key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
s_k = init_beam(key, CHUNK, 2e-3, 0.0, ext, "circular")
H = pipeline.run(dom, s_k, spack=sp, solver="zscan_seg", bins=(431, 321),
                 critical_guard=None, integrator="rk2s4",
                 seg_weights="slab")
H.block_until_ready()
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
for k in range(1, 4):
    s_k = init_beam(jax.random.fold_in(key, k), CHUNK, 2e-3, 0.0, ext,
                    "circular")
    H = pipeline.run(dom, s_k, spack=sp, solver="zscan_seg",
                     bins=(431, 321), critical_guard=None,
                     integrator="rk2s4", seg_weights="slab")
H.block_until_ready()
t_steady = (time.perf_counter() - t0) / 3
emit(stage="decomposition", field_s=round(t_field, 3),
     build_dispatch_s=round(t_dispatch, 3), build_ready_s=round(t_ready, 3),
     first_chunk_s=round(t_first, 3), steady_chunk_s=round(t_steady, 3))
del sp, H

# warm-build re-measure: host trace is now cached in-process
t0 = time.perf_counter()
dom2 = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
sp2 = build_segment_pack_device(dom2, K=DIM, dtype="int4", free_ne=True)
t_d2 = time.perf_counter() - t0
jax.block_until_ready(sp2.seg_planes)
t_r2 = time.perf_counter() - t0
emit(stage="warm_rebuild", build_dispatch_s=round(t_d2, 3),
     build_ready_s=round(t_r2, 3))
del sp2

# ---- end-to-end 1e8, serial vs overlap, same session ----------------------
def run_1e8(block_after_build: bool):
    t0 = time.perf_counter()
    d = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(d, K=DIM, dtype="int4", free_ne=True)
    if block_after_build:
        jax.block_until_ready(sp.seg_planes)
    t_pack = time.perf_counter() - t0
    acc = None
    for k in range(TOTAL // CHUNK):
        s_k = init_beam(jax.random.fold_in(key, k), CHUNK, 2e-3, 0.0, ext,
                        "circular")
        Hk = pipeline.run(d, s_k, spack=sp, solver="zscan_seg",
                          bins=(431, 321), critical_guard=None,
                          integrator="rk2s4", seg_weights="slab")
        acc = Hk if acc is None else acc + Hk
    acc.block_until_ready()
    return round(t_pack, 2), round(time.perf_counter() - t0, 2), \
        float(acc.sum())

for mode, blk in (("serial", True), ("overlap", False)):
    pack_s, wall_s, hsum = run_1e8(blk)
    emit(stage="e2e_1e8", mode=mode, pack_s=pack_s, wall_s=wall_s,
         H_sum=hsum, integ="rk2s4", pack="int4", chunk=CHUNK, dim=DIM)
log.close()
