"""X-ray backlighter radiography + self-emission of an imploding liner.

Puts the PROPACEOS opacity pathway (io/eos parses the tables; the
reference never consumes them, src/utils/eos_opacity.py:3-187) to work:
a dense cylindrical shell (liner-like rho field with GRF perturbations)
and a hot core are imaged three ways from the SAME scene —

1. parallel-beam transmission radiograph (area backlighter),
2. magnified point-projection radiograph (X-pinch style point source),
3. grey-body self-emission image (the hot core glows, the cold dense
   shell absorbs).

The opacity is a Kramers-like power law kappa ~ rho^0.5 T^-1.5 sampled
onto a PROPACEOS-convention (T, rho) log-log table first, so the example
exercises the exact table->lookup->transport chain an experimental table
would.

At >HBM scale the same images come from the streamed plane-batch
variants (optics.xray.radiography_streamed /
point_projection_radiograph_streamed): host-resident volumes, one plane
batch on device at a time. `--streamed` forces that path; it turns on
automatically at res >= 512 (the (rho, Te) stack is ~8.6 GB f32 at
1024^3). The streamed scene keeps memory host-side and uses a 2-D
(x, z) shell-radius ripple (4 MB to download instead of a 4 GB volume
through the slow D2H tunnel direction).

Usage: python examples/xray_radiography.py [res] [--streamed] (default 96)
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(globals().get(
    "__file__", "examples/xray_radiography.py")))
sys.path.insert(0, os.path.dirname(_HERE))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

from synthpy_tpu.fields.grf import grf_domain_fft, power_law  # noqa: E402
from synthpy_tpu.optics.xray import (  # noqa: E402
    attenuation_image,
    grey_emissivity,
    make_opacity_lookup,
    point_projection_radiograph,
    self_emission_image,
    xray_survey_streamed,
)

res = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith(
    "--") else 96
res -= res % 2  # grf_domain_fft(res=res//2) yields 2*(res//2) ripple points
STREAMED = "--streamed" in sys.argv or res >= 512
half = 2.5e-3  # box half-size [m]
ax = np.linspace(-half, half, res).astype(np.float32)

# liner: dense shell at r0 with GRF ripple (the instability seed),
# hot low-density core inside. The ripple perturbs the shell radius as
# a function of (x, z) — a 2-D field regardless of scale (at 1024^3 a
# 3-D ripple volume would cost a 4 GB D2H download; the 2-D slice is
# 4 MB and physically it is the shell SURFACE that ripples).
_, ripple3 = grf_domain_fft(jax.random.PRNGKey(7), power_law(-11.0 / 3.0),
                            l_max=2e-3, l_min=3e-4, extent=half,
                            res=min(res, 256) // 2)
ripple_xz = np.asarray(ripple3[:, 0, :])  # (2R, 2R) slice at y ~ -half
if ripple_xz.shape[0] != res:
    # resample the (x, z) ripple onto the res grid (nearest is fine for
    # a shell-seed perturbation)
    idx = np.clip((np.arange(res) * ripple_xz.shape[0]) // res, 0,
                  ripple_xz.shape[0] - 1)
    ripple_xz = ripple_xz[np.ix_(idx, idx)]

X2, Z2 = np.meshgrid(ax, ax, indexing="ij")
r_cyl2 = np.sqrt(X2 ** 2 + Z2 ** 2)
r0_2 = 1.4e-3 * (1.0 + 0.12 * ripple_xz)
shell2 = np.exp(-((r_cyl2 - r0_2) / 2.5e-4) ** 2)
core2 = np.exp(-(r_cyl2 / 8e-4) ** 2)
# the cylinder axis is z, probing is y: rho/Te are constant along y, so
# the 3-D volumes are a broadcast of the (x, z) maps — materialised
# host-side only (numpy), never on device as full volumes
rho = np.ascontiguousarray(np.broadcast_to(
    (0.5 * shell2 + 1e-2 * core2).astype(np.float32)[:, None, :],
    (res, res, res)))                                       # g/cm^3
Te = np.ascontiguousarray(np.broadcast_to(
    (15.0 + 485.0 * core2).astype(np.float32)[:, None, :],
    (res, res, res)))                                       # eV

# Kramers-like opacity sampled onto a PROPACEOS-style log-log table:
# the cold dense shell is optically thick (tau ~ 1-3), the hot dilute
# core transparent but bright in self-emission (T^4)
T_grid = np.logspace(0, 3, 30)
rho_grid = np.logspace(-5, 1, 40)
table = 5e3 * np.outer(T_grid ** -1.5, rho_grid ** 0.5)
kfn = make_opacity_lookup(T_grid, rho_grid, table)

ds = float(ax[1] - ax[0])
t0 = time.time()
pp_kw = dict(source_distance=8e-3, detector_distance=80e-3,
             bins=(431, 321), Lx=90.0, Ly=67.0, probing_direction="y")
if STREAMED:
    # ONE pass over the host (rho, Te) stack feeds all three
    # accumulators (r4 ran radiography_streamed + point_projection
    # separately and re-uploaded the 8.6 GB stack twice: 610.7 s at
    # 1024^3; the survey is bitwise-parity gated against both,
    # tests/test_xray.py::test_xray_survey_single_pass_matches_...)
    imgs = xray_survey_streamed(
        rho, Te, kfn, [ax] * 3, emiss_fn=grey_emissivity(kfn),
        plane_batch=32, **pp_kw)
    trans, emiss, pp = (imgs["transmission"], imgs["emission"],
                        imgs["point_projection"])
else:
    trans = attenuation_image(rho, Te, kfn, ds, probing_direction="y")
    emiss = self_emission_image(rho, Te, grey_emissivity(kfn), ds, "y")
    pp = point_projection_radiograph(
        rho, Te, kfn, [jnp.asarray(ax)] * 3, n_steps=160, **pp_kw)
trans, emiss, pp = (np.asarray(a) for a in (trans, emiss, pp))
elapsed = time.time() - t0

M = (8e-3 + 2 * half + 80e-3) / (8e-3 + half)
row = {
    "res": res,
    "streamed": STREAMED,
    "single_pass_survey": STREAMED,
    "backend": jax.default_backend(),
    "elapsed_s": round(elapsed, 3),
    "magnification": round(M, 2),
    "min_transmission_parallel": float(trans.min()),
    "min_transmission_pp": float(pp.min()),
    "emission_peak_over_median": float(emiss.max() / np.median(emiss)),
}
print(json.dumps(row, allow_nan=False))
if res >= 1024:
    with open(os.path.join(os.path.dirname(_HERE), "scratch",
                           "results_xray_proton_1024.jsonl"), "a") as f:
        f.write(json.dumps(row, allow_nan=False) + "\n")

out = os.path.join(_HERE, "xray_radiographs.npz")
np.savez_compressed(out, parallel=trans, point_projection=pp,
                    emission=emiss)
print(f"saved {out}")
