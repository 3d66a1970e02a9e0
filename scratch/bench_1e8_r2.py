"""North-star MEASURED run (round 2): 1e8 rays, 512^3, end-to-end incl. pack.

Device-side accumulation: chunks are dispatched asynchronously and summed
on-device, so host Python never blocks between chunks (the round-1 harness
synced per chunk via np.asarray).
"""
import sys, os, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

LOG = "/root/repo/scratch/results_1e8_r2.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

try:
    ext = 5e-3
    dim = 512
    CHUNK = int(os.environ.get("NS_CHUNK", 4_000_000))
    TOTAL = 100_000_000
    INTEG = sys.argv[1] if len(sys.argv) > 1 else "rk2"

    t_start = time.perf_counter()   # EVERYTHING counts from here
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(d, K=dim, dtype=jnp.bfloat16,
                                   free_ne=True)
    t_pack = time.perf_counter() - t_start
    log(stage="pack_built", s=round(t_pack, 1))

    key = jax.random.PRNGKey(0)
    acc = None
    for k in range(TOTAL // CHUNK):
        s = init_beam(jax.random.fold_in(key, k), CHUNK, 2e-3, 0.0, ext,
                      "circular")
        H = pipeline.run(d, s, spack=sp, solver="zscan_seg",
                         bins=(431, 321), critical_guard=None,
                         integrator=INTEG)
        acc = H if acc is None else acc + H
    acc.block_until_ready()
    wall = time.perf_counter() - t_start
    log(tag="northstar_1e8_512_r2_measured", rays=TOTAL,
        integrator=INTEG, wall_s=round(wall, 2), pack_s=round(t_pack, 2),
        rays_per_s=round(TOTAL / wall), image_sum=float(acc.sum()))
    import numpy as np
    np.save("/root/repo/scratch/shadow_1e8_r2.npy", np.asarray(acc))
except Exception as e:
    log(error=repr(e)[:300])
log(done=True)
