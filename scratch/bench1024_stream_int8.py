"""1024^3 FULL-PHYSICS streamed march: bf16 vs int8 host packs.

The tunnel-attached H2D upload dominates the streamed path; int8 halves
it (17 GB -> 8.6 GB per full pass)."""
import sys, json, time; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results1024_stream_int8.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                      solve_zscan_segments_streamed)

try:
    ext = 5e-3
    dim = 1024
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    d.inv_brems = True
    rng = np.random.default_rng(0)
    d.external_Te(np.full((dim, dim, dim), 200.0, np.float32), host=True)
    d.external_Z(np.full((dim, dim, dim), 2.0, np.float32), host=True)
    d.ne = np.asarray(d.ne, np.float32)

    s0 = init_beam(jax.random.PRNGKey(0), 1_000_000, 2e-3, 0.0, ext,
                   "circular")
    for dt, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        t0 = time.perf_counter()
        hp = build_segment_pack_streaming(d, K=63, dtype=dt, device=False,
                                          verbose=False)
        t_build = time.perf_counter() - t0
        gb = hp.seg_planes.nbytes / 2**30
        t0 = time.perf_counter()
        res = solve_zscan_segments_streamed(s0, d, hpack=hp,
                                            integrator="rk2s2",
                                            weights="slab")
        t_solve = time.perf_counter() - t0
        log(pack=name, pack_gb=round(gb, 2), build_s=round(t_build, 1),
            stream_solve_s=round(t_solve, 1),
            rays_per_s=round(1_000_000 / t_solve),
            checksum=float(np.asarray(res.sf[0]).sum()))
        del hp, res
except Exception as e:
    log(error=repr(e)[:300])
log(done=True)
