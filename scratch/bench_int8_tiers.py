"""int8 pack x integrator tier sweep at the bench config (512^3, 4M rays)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, RAYS = 512, 4_000_000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    spack = build_segment_pack_device(dom, K=DIM, dtype=dt)
    jax.block_until_ready(spack.seg_planes)
    for integ in ("rk2", "rk2s2", "rk2s4", "rk4"):
        def run():
            return pipeline.run(dom, s0, spack=spack, solver="zscan_seg",
                                bins=(431, 321), integrator=integ,
                                seg_weights="slab")
        H = run(); H.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); H = run(); H.block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"pack": name, "integrator": integ,
                          "Mrays_s": round(RAYS / min(ts) / 1e6, 3),
                          "checksum": float(jnp.asarray(H).sum())}),
              flush=True)
    del spack
