"""Profile one segmented-trace execution; dump Chrome-trace op totals."""
import sys, json, time, glob, gzip, collections
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

LOG = "/root/repo/scratch/results_prof.jsonl"
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
    dim, rays = 512, 262_144   # exactly one auto chunk
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    layout = layout_of(d)
    sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                                   free_ne=True)
    s = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.asarray(sp.dp, u.dtype)

    def run():
        return trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
            shape_ab=sp.shape_ab, layout=layout, K=sp.K, n_seg=1,
            ray_chunk=None)

    r = run(); r.block_until_ready()   # compile
    outdir = "/root/repo/scratch/prof_seg"
    with jax.profiler.trace(outdir):
        r = run(); r.block_until_ready()
    log(stage="profiled", out=outdir)

    # aggregate chrome trace
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    log(files=files[:5])
    if files:
        ev = json.load(gzip.open(files[0]))["traceEvents"]
        tot = collections.Counter()
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                tot[e.get("name", "?")[:60]] += e["dur"]
        top = tot.most_common(15)
        log(top=[[n, round(v / 1e6, 4)] for n, v in top])  # seconds
except Exception as e:  # noqa: BLE001
    log(error=repr(e)[:300])
log(done=True)
