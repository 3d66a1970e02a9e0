"""f32 vs bf16 segment pack at 512^3, and K sweep."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results7.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      solve_zscan_segments)
ext = 5e-3
dim, rays = 512, 4_000_000
d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')

for tag, dt, K in (("f32_K73", jnp.float32, 73), ("bf16_K73", jnp.bfloat16, 73),
                   ("bf16_K146", jnp.bfloat16, 146), ("bf16_K511", jnp.bfloat16, 511)):
    try:
        t0 = time.perf_counter()
        sp = build_segment_pack_device(d, K=K, dtype=dt)
        sp.seg_planes.block_until_ready()
        build_s = time.perf_counter()-t0
        solve_zscan_segments(s0, d, spack=sp)
        r = solve_zscan_segments(s1, d, spack=sp)
        th = float(jnp.nanmax(jnp.abs(r.rf[1])))
        log(tag=tag, build_s=round(build_s,1), run_s=round(r.duration,3),
            rays_per_s=round(rays/r.duration), theta_max=th)
        del sp
    except Exception as e:
        log(tag=tag, error=repr(e)[:200])
log(done=True)
