"""Profile one chunk-sized zscan_seg trace at 512^3 and aggregate op time.

Recipe from .claude/skills/verify: jax.profiler.trace around ONE
chunk-sized execution, parse the Chrome trace, aggregate ph=="X" events.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments, _auto_ray_chunk)

ext = 5e-3
dim = 512
RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
INTEG = sys.argv[2] if len(sys.argv) > 2 else "rk4"

d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
lay = layout_of(d)
sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                               free_ne=True)
sp.seg_planes.block_until_ready()

s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")
s = jnp.asarray(s0)
u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
dp = jnp.float32(sp.dp)
kw = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
          n_seg=sp.seg_planes.shape[0], ray_chunk=None, integrator=INTEG)

f = lambda: trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                                 sp.inv_spacing_ab, dp, **kw)
out = f(); out.block_until_ready()          # compile
t0 = time.perf_counter(); out = f(); out.block_until_ready()
el = time.perf_counter() - t0
print(json.dumps({"rays_per_s": round(RAYS / el), "elapsed": round(el, 3)}),
      flush=True)

outdir = "/tmp/zscan_prof_r2"
with jax.profiler.trace(outdir):
    out = f(); out.block_until_ready()

paths = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))
print("trace:", paths[-1] if paths else "NONE", flush=True)
if paths:
    with gzip.open(paths[-1], "rt") as fh:
        tr = json.load(fh)
    agg = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            # strip trailing numeric suffixes: fusion.123 -> fusion
            base = name.split(".")[0]
            agg[base] += ev["dur"]
            total += ev["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    for name, dur in top:
        print(f"{dur/1e6:9.3f}s {100*dur/max(total,1):5.1f}% {name}")
