"""Effective-stride accuracy ladder at 512^3: exit displacement + image
error vs the f32 full-pack rk2s2 reference, turbulence and lens caustic.
Tiers: eff-4 (stride2+rk2s2 == rk2s4, the already-gated class) and
eff-8 (stride4+rk2s2), each in f32 (pure step-size error) and int4
(step + quantisation)."""
import sys, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      solve_zscan_segments)
from synthpy_tpu.fields.grf import grf_domain_fft

DIM, RAYS = 512, 1_000_000
ext = 5e-3
s0 = init_beam(jax.random.PRNGKey(0), RAYS, 2e-3, 0.0, ext, "circular")

def field(name):
    d = ScalarDomain(2 * ext, DIM)
    if name == "lens":
        return d.test_lens(ne_0=5e24, LR=1.5e-3)
    _, f = grf_domain_fft(jax.random.PRNGKey(7), lambda k: k**(-5/3),
                          l_max=2e-3, l_min=1e-4, extent=ext, res=DIM // 2)
    return d.external_ne(1e24 * (1.0 + 0.5 * f))

for fname in ("turb", "lens"):
    dom = field(fname)
    cell = 2 * ext / (DIM - 1)

    def run_pack(pdt, stride):
        ne_backup = dom.ne
        sp = build_segment_pack_device(dom, K=DIM, dtype=pdt,
                                       plane_stride=stride)
        sf = np.asarray(solve_zscan_segments(
            s0, dom, spack=sp, integrator="rk2s2", weights="slab").sf)
        H = np.asarray(pipeline.run(dom, s0, spack=sp,
                                    solver="zscan_seg", bins=(431, 321),
                                    integrator="rk2s2",
                                    seg_weights="slab"))
        del sp
        dom.ne = ne_backup
        return sf, H

    ref, H_ref = run_pack(jnp.float32, 1)
    for pdt, stride, tag in ((jnp.float32, 2, "f32/eff4"),
                             (jnp.float32, 4, "f32/eff8"),
                             ("int4", 2, "int4/eff4"),
                             ("int4", 4, "int4/eff8")):
        sf, H = run_pack(pdt, stride)
        dx = np.hypot(sf[0] - ref[0], sf[1] - ref[1])
        sm_ref = gaussian_filter(H_ref, 1.0)
        sm = gaussian_filter(H, 1.0)
        print(json.dumps({
            "field": fname, "tier": tag,
            "exit_rms_disp_cells": round(float(np.sqrt((dx**2).mean())
                                               / cell), 4),
            "exit_p99_disp_cells": round(float(np.quantile(dx, 0.99)
                                               / cell), 4),
            "img_rel_l1": round(float(np.abs(H - H_ref).sum()
                                      / H_ref.sum()), 4),
            "img_rel_l1_psf1px": round(float(np.abs(sm - sm_ref).sum()
                                             / sm_ref.sum()), 4),
        }), flush=True)
