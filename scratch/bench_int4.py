"""int4 nibble-pack tier at the production 512^3 shape, vs int8/bf16."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 512
RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

H_ref = None
for pdt, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8"),
                 ("int4", "int4")):
    spack = build_segment_pack_device(dom, K=DIM, dtype=pdt)
    for integ in ("rk2s2", "rk2s4"):
        def run():
            return pipeline.run(dom, s0, spack=spack, solver="zscan_seg",
                                bins=(431, 321), integrator=integ,
                                seg_weights="slab")
        H = run(); H.block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            H = run(); H.block_until_ready()
            times.append(time.perf_counter() - t0)
        el = min(times)
        Hn = np.asarray(H)
        if tag == "bf16" and integ == "rk2s2":
            H_ref = Hn
        rel = (float(np.abs(Hn - H_ref).sum() / H_ref.sum())
               if H_ref is not None else None)
        print(json.dumps({"dim": DIM, "rays": RAYS, "pack": tag,
                          "integ": integ, "s": round(el, 4),
                          "rays_s": round(RAYS / el, 1),
                          "img_rel_l1_vs_bf16_rk2s2": round(rel, 5)}),
              flush=True)
    del spack
