"""Pipeline overhead breakdown at 512^3."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results6.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (make_zscan_pack, make_segment_pack,
                                      solve_zscan_segments)
ext = 5e-3
dim, rays = 512, 2_000_000
d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
pack = build_pack(d)
zp = make_zscan_pack(pack, layout_of(d))
sp = make_segment_pack(zp, K=73)
s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')

# trace only
solve_zscan_segments(s0, d, spack=sp)
r = solve_zscan_segments(s1, d, spack=sp)
log(tag="trace_only", run_s=round(r.duration,3), rays_per_s=round(rays/r.duration))

for sort in (True, False):
    H = pipeline.run(d, s0, spack=sp, solver="zscan_seg", bins=(431,321), sort_rays=sort)
    H.block_until_ready()
    t0 = time.perf_counter()
    H = pipeline.run(d, s1, spack=sp, solver="zscan_seg", bins=(431,321), sort_rays=sort)
    H.block_until_ready()
    dt = time.perf_counter()-t0
    log(tag=f"pipeline_sort{sort}", run_s=round(dt,3), rays_per_s=round(rays/dt))
log(done=True)
