"""Does non-subtractive uniform dither improve int4/int8 caustic images?

Hypothesis: deterministic rounding of the smooth lens gradient field
produces spatially-correlated stepping -> systematic caustic pixel
reshuffle (int4 raw rel-L1 47% at 512^3). Dither decorrelates the
quantisation error into noise at the cost of a slightly larger RMS.
Methodology of scratch/int4_error_512.py (same field, rays, metrics).
"""
import sys, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      quantize_segment_pack,
                                      solve_zscan_segments)

DIM, RAYS = 512, 1_000_000
ext = 5e-3
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
cell = 2 * ext / (DIM - 1)
ne_backup = dom.ne

spf = build_segment_pack_device(dom, K=DIM, dtype=jnp.float32)
dom.ne = ne_backup


def requant(spf, bits, key):
    """quantize_segment_pack with optional non-subtractive dither."""
    n_seg, cells, cols = spf.seg_planes.shape
    K = spf.K
    C = cols // (K + 1)
    qmax = 7.0 if bits == 4 else 127.0

    @jax.jit
    def q(planes):
        v = planes.reshape(n_seg, cells, K + 1, C).astype(jnp.float32)
        amax = jnp.max(jnp.abs(v), axis=1)
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        x = v / scale[:, None]
        if key is not None:
            x = x + jax.random.uniform(key, x.shape, minval=-0.5,
                                       maxval=0.5)
        qc = jnp.clip(jnp.round(x), -qmax, qmax)
        if bits == 8:
            return qc.astype(jnp.int8).reshape(n_seg, cells, cols), scale
        n_blk = K // 2 + 1
        qi = qc.astype(jnp.int8)
        pad = 2 * n_blk - (K + 1)
        if pad:
            qi = jnp.concatenate(
                [qi, jnp.zeros((n_seg, cells, pad, C), jnp.int8)], axis=2)
        lo, hi = qi[:, :, 0::2], qi[:, :, 1::2]
        return ((lo & 15) | ((hi & 15) << 4)).reshape(
            n_seg, cells, n_blk * C), scale

    codes, scale = q(spf.seg_planes)
    return spf._replace(seg_planes=codes, scales=scale,
                        qbits=None if bits == 8 else 4)


def run(sp):
    sf = np.asarray(solve_zscan_segments(
        s0, dom, spack=sp, integrator="rk2s2", weights="slab").sf)
    H = np.asarray(pipeline.run(dom, s0, spack=sp, solver="zscan_seg",
                                bins=(431, 321), integrator="rk2s2",
                                seg_weights="slab"))
    dom.ne = ne_backup
    return sf, H


ref, H_ref = run(spf)
sm_ref = gaussian_filter(H_ref, 1.0)
for bits in (4, 8):
    for tag, key in (("det", None), ("dither", jax.random.PRNGKey(11))):
        sp = requant(spf, bits, key)
        sf, H = run(sp)
        del sp
        dx = np.hypot(sf[0] - ref[0], sf[1] - ref[1])
        sm = gaussian_filter(H, 1.0)
        print(json.dumps({
            "bits": bits, "mode": tag,
            "exit_rms_disp_cells": round(float(np.sqrt((dx**2).mean())
                                               / cell), 4),
            "exit_p99_disp_cells": round(float(np.quantile(dx, 0.99)
                                               / cell), 4),
            "img_rel_l1": round(float(np.abs(H - H_ref).sum()
                                      / H_ref.sum()), 4),
            "img_rel_l1_psf1px": round(float(np.abs(sm - sm_ref).sum()
                                             / sm_ref.sum()), 4),
        }), flush=True)
