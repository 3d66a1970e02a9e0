"""1024^3 K sweep with device-built bf16 packs."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results1024c.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      solve_zscan_segments)
ext = 5e-3
rays = 1_000_000
for K in (341, 1023):
    try:
        d = ScalarDomain(2*ext, 1024).test_lens(ne_0=5e24, LR=1.5e-3)
        t0 = time.perf_counter()
        sp = build_segment_pack_device(d, K=K, dtype=jnp.bfloat16, free_ne=True)
        sp.seg_planes.block_until_ready()
        bs = time.perf_counter()-t0
        s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
        solve_zscan_segments(s0, d, spack=sp)
        s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')
        r = solve_zscan_segments(s1, d, spack=sp)
        log(K=K, build_s=round(bs,1), run_s=round(r.duration,3),
            rays_per_s=round(rays/r.duration),
            theta_max=float(jnp.nanmax(jnp.abs(r.rf[1]))))
        del sp, d
    except Exception as e:
        log(K=K, error=repr(e)[:200])
log(done=True)
