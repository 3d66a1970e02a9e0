"""1024^3 K sweep: does the builder survive K=63/127, and is it faster?"""
import sys, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results1024e.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

ext = 5e-3
dim = 1024

for K in (63, 127):
    try:
        d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        t0 = time.perf_counter()
        sp = build_segment_pack_device(d, K=K, dtype=jnp.bfloat16,
                                       free_ne=True)
        build_s = time.perf_counter() - t0
        s0 = init_beam(jax.random.PRNGKey(0), 1_000_000, 2e-3, 0.0, ext,
                       "circular")
        def run():
            return pipeline.run(d, s0, spack=sp, solver="zscan_seg",
                                bins=(431, 321))
        H = run(); H.block_until_ready()
        times = []
        for _ in range(2):
            t0 = time.perf_counter(); H = run(); H.block_until_ready()
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(K=K, build_s=round(build_s, 1), run_s=round(t, 3),
            rays_per_s=round(1_000_000 / t), image_sum=float(H.sum()))
        del sp, H, d
    except Exception as e:  # noqa: BLE001
        log(K=K, error=repr(e)[:250])
log(done=True)
