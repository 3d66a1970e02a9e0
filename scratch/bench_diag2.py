"""Per-diagnostic throughput at 512^3 with tuned chunking (bf16, K=511)."""
import sys, json, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
LOG = "/root/repo/scratch/results_diag2.jsonl"
def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f: f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

ext = 5e-3
dim, rays = 512, 4_000_000

try:
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True          # coherent diagnostics need the phase channel
    t0 = time.perf_counter()
    sp = build_segment_pack_device(d, K=dim - 1, dtype=jnp.bfloat16,
                                   free_ne=True)
    log(stage="pack_built", s=round(time.perf_counter() - t0, 1))
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")

    for diag in ("shadowgraphy", "schlieren_df", "refractometry",
                 "interferometry", "refractometry_coherent"):
        try:
            def run():
                return pipeline.run(d, s0, spack=sp, solver="zscan_seg",
                                    diagnostic=diag, bins=(431, 321))
            H = run(); H.block_until_ready()
            times = []
            for _ in range(2):
                t0 = time.perf_counter(); H = run(); H.block_until_ready()
                times.append(time.perf_counter() - t0)
            t = min(times)
            log(diag=diag, run_s=round(t, 3), rays_per_s=round(rays / t),
                image_sum=float(jnp.abs(H).sum()))
        except Exception as e:  # noqa: BLE001
            log(diag=diag, error=repr(e)[:200])
except Exception as e:  # noqa: BLE001
    log(error=repr(e)[:300])
log(done=True)
