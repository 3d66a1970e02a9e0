"""Host-loop zscan benchmark + Pallas gather feasibility."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

LOG = "/root/repo/scratch/results3.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import solve_zscan

ext = 5e-3

def bench(dim, rays, tag, host_loop=True):
    try:
        d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        pack = build_pack(d)
        s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, 'circular')
        r0 = solve_zscan(s0, d, pack=pack, host_loop=host_loop)  # compile
        s1 = init_beam(jax.random.PRNGKey(1), rays, 2e-3, 0.0, ext, 'circular')
        r1 = solve_zscan(s1, d, pack=pack, host_loop=host_loop)
        log(tag=tag, dim=dim, rays=rays, host_loop=host_loop,
            first_s=round(r0.duration,2), run_s=round(r1.duration,4),
            rays_per_s=round(rays/r1.duration,1),
            theta_max=float(jnp.nanmax(jnp.abs(r1.rf[1]))))
    except Exception as e:
        log(tag=tag, error=repr(e)[:300])

bench(128, 1_000_000, "hl128")
bench(256, 1_000_000, "hl256")
bench(512, 1_000_000, "hl512")
bench(512, 4_000_000, "hl512_4M")
log(done="hostloop")

# pallas gather feasibility
os.system(f"{sys.executable} -u /root/repo/scratch/pallas_gather_test.py >> /root/repo/scratch/results3.jsonl.pallas 2>&1")
log(done=True)
