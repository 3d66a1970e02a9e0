"""1024^3-scale shadowgraphy through the one-call API.

The HBM-pressure regime: a 1024^3 field's segment pack is ~6.4 GB, where
in-program ray chunking does not compile on the tunnel runtime and a
single multi-million-ray program OOMs. pipeline.run now detects this
(pack bytes > batch_pack_bytes) and transparently traces the bundle in
same-shape per-call batches, summing the detector images — the user just
calls run() with 4M+ rays (the reference's auto-batching analogue,
domain.py:137-227, re-expressed at the API surface).

Usage: python examples/scale_1024.py [dim] [rays] [rk2|rk4]   (defaults 1024, 4e6, rk2)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from synthpy_tpu import pipeline
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import build_segment_pack_device

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
rays = int(float(sys.argv[2])) if len(sys.argv) > 2 else 4_000_000

ext = 5e-3
t0 = time.perf_counter()
domain = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
spack = build_segment_pack_device(domain, K=31, dtype=jnp.bfloat16,
                                  free_ne=True)
t_pack = time.perf_counter() - t0

s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")

t0 = time.perf_counter()
integ = sys.argv[3] if len(sys.argv) > 3 else "rk2"
H = pipeline.run(domain, s0, spack=spack, solver="zscan_seg",
                 bins=(431, 321), critical_guard=None, integrator=integ)
H = jnp.asarray(H)
H.block_until_ready()
t_trace = time.perf_counter() - t0

print(json.dumps({
    "dim": dim, "rays": rays, "integrator": integ,
    "pack_s": round(t_pack, 1), "trace_s": round(t_trace, 1),
    "rays_per_s": round(rays / t_trace),
    "image_sum": float(H.sum()),
}))
