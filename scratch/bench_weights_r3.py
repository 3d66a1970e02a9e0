"""Round-3 perf: per-slab weight hoist (weights='slab') vs strict per-stage.

Measures the segmented march at 512^3 / 4M rays for rk2, rk2s2, rk4 in
both weight modes on one chip. VERDICT r2 item 2 names the
inside-mask-once-per-slab lever; weights='slab' hoists the whole
transverse weight computation (index arithmetic, clips, mask) to once
per slab.

Usage:  python scratch/bench_weights_r3.py [dim] [rays]
Appends one JSON line per config to scratch/results_weights_r3.jsonl.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthpy_tpu import pipeline
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    sp = build_segment_pack_device(d, K=dim, dtype=jnp.bfloat16)
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")

    out_path = os.path.join(os.path.dirname(__file__),
                            "results_weights_r3.jsonl")
    for integ in ("rk2s2", "rk2", "rk4"):
        for w in ("stage", "slab"):
            def run():
                return pipeline.run(d, s0, solver="zscan_seg", spack=sp,
                                    bins=(431, 321), critical_guard=None,
                                    integrator=integ, seg_weights=w)

            H = run()
            H.block_until_ready()
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                H = run()
                H.block_until_ready()
                times.append(time.perf_counter() - t0)
            el = min(times)
            rec = {"dim": dim, "rays": rays, "integrator": integ,
                   "weights": w, "elapsed_s": round(el, 3),
                   "rays_s": round(rays / el, 1),
                   "checksum": float(jnp.asarray(H).sum())}
            print(json.dumps(rec), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
