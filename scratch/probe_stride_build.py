"""Build-time probe: the fused stride-2 builder at 512^3 K=512 (n_seg=1)
took 79.9 s (compile pathology); K=256 at 1024^3 compiled in 8.8 s.
Measure K choices at 512^3, and the post-hoc decimate route."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      decimate_segment_pack,
                                      quantize_segment_pack)
ext = 5e-3
for mode in ("fused_K256", "fused_K128", "posthoc_K512"):
    dom = ScalarDomain(2 * ext, 512).test_lens(ne_0=5e24, LR=1.5e-3)
    t0 = time.perf_counter()
    if mode.startswith("fused"):
        K = int(mode.split("K")[1])
        sp = build_segment_pack_device(dom, K=K, dtype="int4",
                                       free_ne=True, plane_stride=2)
    else:
        spf = build_segment_pack_device(dom, K=512, dtype=jnp.float32,
                                        free_ne=True)
        sp = quantize_segment_pack(decimate_segment_pack(spf, 2), bits=4)
        del spf
    sp.seg_planes.block_until_ready()
    print(json.dumps({"mode": mode,
                      "build_s": round(time.perf_counter() - t0, 2),
                      "K": sp.K}), flush=True)
    del sp, dom
