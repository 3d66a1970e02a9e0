"""North-star rerun with the tuned config: K=511 bf16 pack, 3 GB chunks."""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results_1e8b.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu import pipeline
from synthpy_tpu.campaign import run_campaign
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

try:
    ext = 5e-3
    dim = 512
    d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    t0 = time.perf_counter()
    sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                                   free_ne=True)
    log(stage="pack_built", s=round(time.perf_counter() - t0, 1))

    CHUNK = 4_000_000
    TOTAL = 100_000_000

    def chunk(key, k):
        s = init_beam(key, CHUNK, 2e-3, 0.0, ext, "circular")
        return {"shadow": pipeline.run(d, s, spack=sp, solver="zscan_seg",
                                       bins=(431, 321))}

    t0 = time.perf_counter()
    acc = run_campaign(chunk, TOTAL, CHUNK, jax.random.PRNGKey(0))
    wall = time.perf_counter() - t0
    log(tag="northstar_1e8_512_tuned", rays=TOTAL, wall_s=round(wall, 1),
        rays_per_s=round(TOTAL / wall), image_sum=float(acc["shadow"].sum()))
    import numpy as np
    np.save("/root/repo/scratch/shadow_1e8b.npy", acc["shadow"])
except Exception as e:
    log(error=repr(e)[:300])
log(done=True)
