"""Final round-1 TPU validation: coherent pipeline at 512^3 + GRF shot."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results_final.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, grf
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

try:
    ext = 5e-3
    d = ScalarDomain(2*ext, 512).test_lens(ne_0=2e25, LR=2e-3)
    d.phaseshift = True
    sp = build_segment_pack_device(d, K=511, dtype=jnp.bfloat16, free_ne=True)
    rays = 4_000_000
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2.5e-3, 0.0, ext, 'circular')
    for diag in ("interferometry", "schlieren_df", "refractometry_coherent"):
        H = pipeline.run(d, s0, spack=sp, solver="zscan_seg", diagnostic=diag,
                         bins=(431,321))
        H.block_until_ready()
        s1 = init_beam(jax.random.PRNGKey(1), rays, 2.5e-3, 0.0, ext, 'circular')
        t0 = time.perf_counter()
        H = pipeline.run(d, s1, spack=sp, solver="zscan_seg", diagnostic=diag,
                         bins=(431,321))
        H.block_until_ready()
        dt = time.perf_counter()-t0
        log(tag=f"coh_{diag}", dim=512, rays=rays, run_s=round(dt,3),
            rays_per_s=round(rays/dt), Hmax=float(H.max()))
    del sp, d
except Exception as e:
    log(error=repr(e)[:300])

# GRF multi-diagnostic shot at 256^3, 1e7 rays
try:
    import subprocess
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "/root/repo/examples/magpie_shot.py",
                        "-d", "256", "-r", "10000000", "--chunk", "2000000",
                        "-o", "/root/repo/scratch/shot_256"],
                       capture_output=True, text=True, timeout=3000)
    log(tag="magpie_shot_256_1e7", wall_s=round(time.perf_counter()-t0,1),
        ok=r.returncode == 0, tail=r.stdout[-300:])
except Exception as e:
    log(error=repr(e)[:300])
log(done=True)
