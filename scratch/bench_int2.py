"""Measure hoisted-blend rk4 vs rk2 at 512^3 on the real chip."""
import sys, time, json; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments, _auto_ray_chunk)

ext = 5e-3
dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
lay = layout_of(d)
t0 = time.perf_counter()
sp = build_segment_pack_device(d, K=dim, dtype=jnp.bfloat16, free_ne=True)
sp.seg_planes.block_until_ready()
print("pack_s", round(time.perf_counter() - t0, 1), "K", sp.K, flush=True)

s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")
s = jnp.asarray(s0)
u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
dp = jnp.float32(sp.dp)
rc = _auto_ray_chunk(sp)
kw = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
          n_seg=sp.seg_planes.shape[0], ray_chunk=rc)

for integ in ("rk2", "rk2s2"):
    f = lambda: trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                                     sp.inv_spacing_ab, dp,
                                     integrator=integ, **kw)
    out = f(); out.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(); out.block_until_ready()
        times.append(time.perf_counter() - t0)
    el = min(times)
    print(json.dumps({"integrator": integ, "rays_per_s": round(RAYS / el),
                      "elapsed": round(el, 3),
                      "checksum": float(out[:, 0].sum())}), flush=True)
