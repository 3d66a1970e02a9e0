"""Unroll sweep of the segment slab scan at 512^3 / K=511 / bf16 / 4M."""
import sys, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results_unroll.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments, _auto_ray_chunk)

try:
    ext = 5e-3
    dim, rays = 512, 4_000_000
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    layout = layout_of(d)
    sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                                   free_ne=True)
    chunk = _auto_ray_chunk(sp)
    s = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.asarray(sp.dp, u.dtype)
    log(stage="setup", chunk=chunk)
    for unroll in (1, 2, 4):
        try:
            def run(un=unroll):
                return trace_zscan_segments(
                    u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
                    shape_ab=sp.shape_ab, layout=layout, K=sp.K, n_seg=1,
                    ray_chunk=chunk, unroll=un)
            r = run(); r.block_until_ready()
            times = []
            for _ in range(2):
                t0 = time.perf_counter(); r = run(); r.block_until_ready()
                times.append(time.perf_counter() - t0)
            t = min(times)
            log(unroll=unroll, run_s=round(t, 3),
                rays_per_s=round(rays / t),
                checksum=float(jnp.abs(r[:, 2]).sum()))
        except Exception as e:  # noqa: BLE001
            log(unroll=unroll, error=repr(e)[:200])
except Exception as e:  # noqa: BLE001
    log(error=repr(e)[:300])
log(done=True)
