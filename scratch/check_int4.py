"""Sanity: int4 nibble pack decode exactness + image closeness."""
import sys, json
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      quantize_segment_pack)

DIM, RAYS = 65, 40000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
sp_f = build_segment_pack_device(dom, K=16, dtype=jnp.float32)
sp_4 = quantize_segment_pack(sp_f, bits=4)
sp_4b = build_segment_pack_device(dom, K=16, dtype="int4")

# 1. decode exactness: unpack nibbles by hand, dequantise, compare to the
#    explicit round(v/scale)*scale
n_seg, cells, cols = sp_f.seg_planes.shape
K = sp_f.K
C = cols // (K + 1)
v = np.asarray(sp_f.seg_planes, np.float32).reshape(n_seg, cells, K + 1, C)
amax = np.abs(v).max(axis=1)
scale = np.where(amax > 0, amax / 7.0, 1.0)
q_ref = np.clip(np.round(v / scale[:, None]), -7, 7)
pk = np.asarray(sp_4.seg_planes).view(np.uint8).reshape(
    n_seg, cells, K // 2 + 1, C)
lo = (pk.astype(np.int8) << 4) >> 4
hi = pk.astype(np.int8) >> 4
dec = np.empty((n_seg, cells, K + 2, C), np.int8)
dec[:, :, 0::2] = lo
dec[:, :, 1::2] = hi
dec = dec[:, :, :K + 1]
print("decode exact:", bool((dec == q_ref).all()),
      "scale match:", bool(np.allclose(np.asarray(sp_4.scales), scale)))
print("builder==quantizer planes:",
      bool((np.asarray(sp_4b.seg_planes) == np.asarray(sp_4.seg_planes)).all()),
      "scales:", bool(np.allclose(np.asarray(sp_4b.scales),
                                  np.asarray(sp_4.scales), rtol=1e-6)))

# 2. image closeness through pipeline.run for both even-stride tiers
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")
for integ in ("rk2s2", "rk2s4"):
    H_ref = np.asarray(pipeline.run(dom, s0, spack=sp_f, solver="zscan_seg",
                                    bins=(54, 40), integrator=integ,
                                    seg_weights="slab"))
    H_4 = np.asarray(pipeline.run(dom, s0, spack=sp_4, solver="zscan_seg",
                                  bins=(54, 40), integrator=integ,
                                  seg_weights="slab"))
    print(json.dumps({"integ": integ,
                      "img_rel_l1": round(float(np.abs(H_4 - H_ref).sum()
                                                / H_ref.sum()), 5)}))
