"""Round 2 TPU bench: SoA zscan at 128/256/512."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

LOG = "/root/repo/scratch/results2.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam

ext = 5e-3

def bench(dim, rays, solver, tag, **kw):
    try:
        d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        pack = build_pack(d)
        s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
        t0 = time.perf_counter()
        H = pipeline.run(d, s0, pack=pack, solver=solver, bins=(431,321), **kw)
        H.block_until_ready()
        compile_run = time.perf_counter() - t0
        s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')
        t0 = time.perf_counter()
        H = pipeline.run(d, s1, pack=pack, solver=solver, bins=(431,321), **kw)
        H.block_until_ready()
        run = time.perf_counter() - t0
        log(tag=tag, dim=dim, rays=rays, solver=solver,
            compile_plus_run_s=round(compile_run,2), run_s=round(run,4),
            rays_per_s=round(rays/run,1), checksum=float(H.sum()))
    except Exception as e:
        log(tag=tag, error=repr(e))

bench(128, 1_000_000, "zscan", "z128_soa")
bench(256, 1_000_000, "zscan", "z256_soa")
bench(512, 1_000_000, "zscan", "z512_soa")
bench(512, 4_000_000, "zscan", "z512_soa_4M")
log(done=True)
