"""Profile one chunk-sized rk2s2 segmented march at 512^3 (round 3).

Dumps a Chrome trace, aggregates ph=="X" events by op class, prints the
top classes — the method that found the 28%-concatenate issue in round 2.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    integ = sys.argv[3] if len(sys.argv) > 3 else "rk2s2"
    weights = sys.argv[4] if len(sys.argv) > 4 else "slab"
    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    sp = build_segment_pack_device(d, K=dim, dtype=jnp.bfloat16)
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    kw = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
              n_seg=sp.seg_planes.shape[0], integrator=integ,
              weights=weights, ray_chunk=None)

    out = trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                               sp.inv_spacing_ab, dp, **kw)
    out.block_until_ready()

    outdir = f"/tmp/prof_r3_{integ}_{weights}"
    with jax.profiler.trace(outdir):
        out = trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                                   sp.inv_spacing_ab, dp, **kw)
        out.block_until_ready()

    paths = glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz")
    assert paths, outdir
    with gzip.open(paths[0]) as f:
        tr = json.load(f)
    agg = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0.0)
        cls = name.split(".")[0].split("(")[0]
        agg[cls] += dur
        total += dur
    print(f"== {integ}/{weights} {rays} rays {dim}^3; total {total/1e6:.3f}s")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v/1e3:10.1f} ms  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
