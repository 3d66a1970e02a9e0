"""Stride-tier pack build at 512^3: quantised-direct-build + decimate
(new route) vs the f32-build route it replaces (forced via a huge
fuse... no — forced by hand below), on the real chip."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      decimate_segment_pack,
                                      quantize_segment_pack)

DIM, ext = 512, 5e-3

def timeit(label, fn):
    t0 = time.perf_counter()
    sp = fn()
    sp.seg_planes.block_until_ready()
    print(json.dumps({"what": label,
                      "s": round(time.perf_counter() - t0, 2),
                      "K": sp.K, "qbits": sp.qbits,
                      "bytes": sp.seg_planes.nbytes}), flush=True)
    return sp

dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
# old route, reproduced by hand: f32 full build + decimate + quantise
sp_old = timeit("old_f32_decimate_quantise", lambda: quantize_segment_pack(
    decimate_segment_pack(
        build_segment_pack_device(dom, K=DIM, dtype=jnp.float32), 2), 4))
del sp_old
# new route (what the builder now auto-selects)
sp_new = timeit("new_int4_then_decimate", lambda: build_segment_pack_device(
    dom, K=DIM, dtype="int4", plane_stride=2))
del sp_new
# stride-4 (eff-8 tier) via the new route
sp4 = timeit("new_int4_stride4", lambda: build_segment_pack_device(
    dom, K=DIM, dtype="int4", plane_stride=4))
