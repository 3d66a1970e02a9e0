"""Optimization matrix: sort x dtype x unroll for AoS zscan."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

LOG = "/root/repo/scratch/results4.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import make_zscan_pack, solve_zscan

ext = 5e-3
dim = 256
rays = 1_000_000
d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
pack = build_pack(d)
lay = layout_of(d)
zp32 = make_zscan_pack(pack, lay)
zp16 = make_zscan_pack(pack, lay, dtype=jnp.bfloat16)
s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')

def bench(tag, **kw):
    try:
        solve_zscan(s0, d, **kw)  # compile
        r = solve_zscan(s1, d, **kw)
        log(tag=tag, run_s=round(r.duration,4),
            rays_per_s=round(rays/r.duration,1))
    except Exception as e:
        log(tag=tag, error=repr(e)[:200])

bench("base_f32", zpack=zp32)
bench("sorted_f32", zpack=zp32, sort_rays=True)
bench("sorted_bf16", zpack=zp16, sort_rays=True)
bench("sorted_bf16_unroll4", zpack=zp16, sort_rays=True, unroll=4)
bench("base_bf16", zpack=zp16)
log(done=True)
