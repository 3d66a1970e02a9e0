"""Manual TPU benchmark: pipeline throughput scaling with ray count."""
import sys, os; sys.path.insert(0, "/root/repo")
import time, jax
from synthpy_tpu.fields import ScalarDomain, build_pack
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam

ext = 5e-3
dim = int(os.environ.get("DIM", "128"))
solver = os.environ.get("SOLVER", "zscan")
domain = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
pack = build_pack(domain)

for rays in (100_000, 200_000, 400_000):
    s0 = init_beam(jax.random.PRNGKey(rays), rays, 2e-3, 0.0, ext, 'circular')
    H = pipeline.run(domain, s0, pack=pack, solver=solver, bins=(431,321))
    H.block_until_ready()  # compile (per-shape)
    s1 = init_beam(jax.random.PRNGKey(rays+1), rays, 2e-3, 0.0, ext, 'circular')
    t0 = time.perf_counter()
    H = pipeline.run(domain, s1, pack=pack, solver=solver, bins=(431,321))
    H.block_until_ready()
    dt = time.perf_counter()-t0
    print(f"{solver} dim={dim} rays={rays}: {dt*1e3:.1f} ms -> {rays/dt/1e6:.2f} M rays/s", flush=True)
