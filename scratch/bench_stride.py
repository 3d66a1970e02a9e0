"""512^3 plane-decimated pack ladder. rk2s2 on a stride-2 pack is
BIT-IDENTICAL to rk2s4 on the full pack (test-gated) but gathers half
the corner-row bytes; the march is gather-bound, so pack stride is the
cleanest remaining lever. Ladder: effective stride S via pack stride
S/2 + rk2s2 (minimal gather bytes for that arithmetic)."""
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
CASES = [
    # (pack dtype, pack stride, integrator, label)
    ("int4", 1, "rk2s4", "int4 full rk2s4 (baseline 8.69M)"),
    ("int4", 2, "rk2s2", "int4 stride2 rk2s2 (== rk2s4, half gather)"),
    ("int4", 2, "rk2s4", "int4 stride2 rk2s4 (eff-stride-8)"),
    ("int4", 4, "rk2s2", "int4 stride4 rk2s2 (== eff-stride-8, 1/4 gather)"),
    (jnp.int8, 2, "rk2s2", "int8 stride2 rk2s2 (== rk2s4, int8 accuracy)"),
    (jnp.bfloat16, 2, "rk2s2", "bf16 stride2 rk2s2 (== rk2s4, exactest)"),
]
packs = {}
for pdt, stride, integ, label in CASES:
    key = (str(pdt), stride)
    if key not in packs:
        packs[key] = build_segment_pack_device(dom, K=DIM, dtype=pdt,
                                               plane_stride=stride)
    sp = packs[key]
    def run():
        return pipeline.run(dom, s0, spack=sp, solver="zscan_seg",
                            bins=(431, 321), integrator=integ,
                            seg_weights="slab", critical_guard=None)
    H = run(); H.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        H = run(); H.block_until_ready()
        ts.append(time.perf_counter() - t0)
    el = min(ts)
    print(json.dumps({"dim": DIM, "rays": RAYS, "label": label,
                      "stride": stride, "integ": integ, "s": round(el, 3),
                      "rays_s": round(RAYS / el, 1),
                      "H_sum": float(H.sum())}), flush=True)
