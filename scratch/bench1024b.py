"""1024^3 with on-device pack build."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results1024b.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      solve_zscan_segments)
try:
    ext = 5e-3
    dim = 1024
    t0 = time.perf_counter()
    d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    log(stage="field", s=round(time.perf_counter()-t0,1))
    t0 = time.perf_counter()
    sp = build_segment_pack_device(d, K=31, dtype=jnp.bfloat16, free_ne=True)
    sp.seg_planes.block_until_ready()
    log(stage="segpack_device", s=round(time.perf_counter()-t0,1))
    import gc; gc.collect()
    rays = 1_000_000
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
    r0 = solve_zscan_segments(s0, d, spack=sp, ray_chunk=131072)
    s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')
    r1 = solve_zscan_segments(s1, d, spack=sp, ray_chunk=131072)
    log(stage="trace", first_s=round(r0.duration,2), run_s=round(r1.duration,3),
        rays_per_s=round(rays/r1.duration),
        theta_max=float(jnp.nanmax(jnp.abs(r1.rf[1]))))
except Exception as e:
    log(error=repr(e)[:300])
log(done=True)
