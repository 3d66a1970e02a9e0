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

Usage: python examples/xray_radiography.py [res] (default 96)
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
)

res = int(sys.argv[1]) if len(sys.argv) > 1 else 96
res -= res % 2  # grf_domain_fft(res=res//2) yields 2*(res//2) ripple points
half = 2.5e-3  # box half-size [m]
ax = np.linspace(-half, half, res).astype(np.float32)
X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
r = np.sqrt(X ** 2 + Y ** 2)  # cylinder radius about z... probing is y

# liner: dense shell at r0 with GRF ripple (the instability seed),
# hot low-density core inside
r_cyl = np.sqrt(X ** 2 + Z ** 2)
# grf_domain_fft yields 2*res points per axis over [-extent, extent)
_, ripple = grf_domain_fft(jax.random.PRNGKey(7), power_law(-11.0 / 3.0),
                           l_max=2e-3, l_min=3e-4, extent=half,
                           res=res // 2)
ripple = np.asarray(ripple)[:res, :res, :res]
r0 = 1.4e-3 * (1.0 + 0.12 * ripple)
shell = np.exp(-((r_cyl - r0) / 2.5e-4) ** 2)
core = np.exp(-(r_cyl / 8e-4) ** 2)
rho = (0.5 * shell + 1e-2 * core).astype(np.float32)       # g/cm^3
Te = (15.0 + 485.0 * core).astype(np.float32)              # eV

# Kramers-like opacity sampled onto a PROPACEOS-style log-log table:
# the cold dense shell is optically thick (tau ~ 1-3), the hot dilute
# core transparent but bright in self-emission (T^4)
T_grid = np.logspace(0, 3, 30)
rho_grid = np.logspace(-5, 1, 40)
table = 5e3 * np.outer(T_grid ** -1.5, rho_grid ** 0.5)
kfn = make_opacity_lookup(T_grid, rho_grid, table)

ds = float(ax[1] - ax[0])
t0 = time.time()
trans = attenuation_image(rho, Te, kfn, ds, probing_direction="y")
emiss = self_emission_image(rho, Te, grey_emissivity(kfn), ds, "y")
pp = point_projection_radiograph(
    rho, Te, kfn, [jnp.asarray(ax)] * 3,
    source_distance=8e-3, detector_distance=80e-3,
    bins=(431, 321), Lx=90.0, Ly=67.0, n_steps=160,
    probing_direction="y")
trans, emiss, pp = (np.asarray(a) for a in (trans, emiss, pp))
elapsed = time.time() - t0

M = (8e-3 + 2 * half + 80e-3) / (8e-3 + half)
print(json.dumps({
    "res": res,
    "elapsed_s": round(elapsed, 3),
    "magnification": round(M, 2),
    "min_transmission_parallel": float(trans.min()),
    "min_transmission_pp": float(pp.min()),
    "emission_peak_over_median": float(emiss.max() / np.median(emiss)),
}))

out = os.path.join(_HERE, "xray_radiographs.npz")
np.savez_compressed(out, parallel=trans, point_projection=pp,
                    emission=emiss)
print(f"saved {out}")
