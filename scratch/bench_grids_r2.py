"""Round-2 README table: rk4/rk2 throughput at 128/256/512 on one chip."""
import sys, time, json; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments, _auto_ray_chunk)

ext = 5e-3
RAYS = 4_000_000
for dim in (128, 256, 512):
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                                   free_ne=True)
    sp.seg_planes.block_until_ready()
    s = jnp.asarray(init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext,
                              "circular"))
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)
    rc = _auto_ray_chunk(sp)
    for integ in ("rk4", "rk2"):
        f = lambda: trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
            integrator=integ, ray_chunk=rc, shape_ab=sp.shape_ab,
            layout=lay, K=sp.K, n_seg=sp.seg_planes.shape[0])
        out = f(); out.block_until_ready()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(); out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"dim": dim, "integrator": integ,
                          "rays_per_s": round(RAYS / min(ts)),
                          "checksum": float(out[:, 0].sum())}), flush=True)
    del sp
