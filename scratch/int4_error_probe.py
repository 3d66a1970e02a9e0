"""int4 accuracy probe (error only, no perf): is 15-level quantisation
of the corner tables within image-equivalence tolerance?"""
import sys, json
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import build_segment_pack_device

DIM, RAYS = 65, 40000
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
sp_f = build_segment_pack_device(dom, K=16, dtype=jnp.float32)
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

def quant_bits(sp, bits):
    n_seg, cells, cols = sp.seg_planes.shape
    K = sp.K; C = cols // (K + 1)
    qmax = 2 ** (bits - 1) - 1
    v = sp.seg_planes.reshape(n_seg, cells, K + 1, C)
    amax = jnp.max(jnp.abs(v), axis=1)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(v / scale[:, None]), -qmax, qmax)
    return sp._replace(
        seg_planes=(q * scale[:, None]).reshape(n_seg, cells, cols))

H_ref = np.asarray(pipeline.run(dom, s0, spack=sp_f, solver="zscan_seg",
                                bins=(54, 40), integrator="rk2s2",
                                seg_weights="slab"))
for bits in (8, 6, 4):
    sp_q = quant_bits(sp_f, bits)
    H_q = np.asarray(pipeline.run(dom, s0, spack=sp_q,
                                  solver="zscan_seg", bins=(54, 40),
                                  integrator="rk2s2",
                                  seg_weights="slab"))
    print(json.dumps({"bits": bits,
                      "img_rel_l1": round(float(np.abs(H_q - H_ref).sum()
                                                / H_ref.sum()), 4)}),
          flush=True)
