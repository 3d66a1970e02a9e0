"""Segmented tracer benchmark vs plain zscan."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

LOG = "/root/repo/scratch/results5.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (make_zscan_pack, make_segment_pack,
                                      solve_zscan, solve_zscan_segments)

ext = 5e-3

def run(dim, rays, K, tag, ray_chunk=None):
    try:
        d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        pack = build_pack(d)
        zp = make_zscan_pack(pack, layout_of(d))
        sp = make_segment_pack(zp, K=K)
        s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
        solve_zscan_segments(s0, d, spack=sp, ray_chunk=ray_chunk)  # compile
        s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')
        r = solve_zscan_segments(s1, d, spack=sp, ray_chunk=ray_chunk)
        log(tag=tag, dim=dim, rays=rays, K=K, run_s=round(r.duration,4),
            rays_per_s=round(rays/r.duration,1),
            theta_max=float(jnp.nanmax(jnp.abs(r.rf[1]))))
    except Exception as e:
        log(tag=tag, error=repr(e)[:300])

run(128, 1_000_000, 32, "seg128_K32")
run(256, 1_000_000, 64, "seg256_K64")
run(512, 1_000_000, 73, "seg512_K73", ray_chunk=262144)
run(512, 4_000_000, 73, "seg512_4M", ray_chunk=262144)
log(done=True)
