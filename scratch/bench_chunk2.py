"""Chunk-size sweep for the segmented tracer at 512^3 / 4M rays (bf16)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = "/root/repo/scratch/results_chunk2.jsonl"


def log(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import build_segment_pack_device

    dim, rays = 512, 4_000_000
    ext = 5e-3
    domain = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    spack = build_segment_pack_device(domain, K=dim - 1, dtype=jnp.bfloat16)
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    log({"stage": "setup_done", "K": spack.K})

    for chunk in (131_072, 196_608, 262_144, 393_216):
        try:
            def run(c=chunk):
                return pipeline.run(domain, s0, solver="zscan_seg",
                                    bins=(431, 321), spack=spack,
                                    ray_chunk=c)
            H = run(); H.block_until_ready()   # compile
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                H = run(); H.block_until_ready()
                times.append(time.perf_counter() - t0)
            t = min(times)
            log({"chunk": chunk, "run_s": round(t, 4),
                 "rays_per_s": round(rays / t, 1),
                 "image_sum": float(H.sum())})
        except Exception as e:  # noqa: BLE001
            log({"chunk": chunk, "error": repr(e)[:200]})
    log({"done": True})


if __name__ == "__main__":
    main()
