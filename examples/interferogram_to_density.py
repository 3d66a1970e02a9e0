"""The full experimental analysis loop, synthetic end to end.

Forward: a cylindrical Gaussian plasma column (axis along x) is traced
with phase accumulation, interfered with a tilted reference beam, and
binned to a Mach-Zehnder interferogram + matching background
(reference interference_MPI.py workflow).

Backward — the chain an experimentalist runs on the real camera image:
Takeda carrier demodulation of shot vs background (analysis.fringes)
-> anchored 2-D unwrap -> per-row inverse Abel transform
(analysis.abel.invert_phase_map) -> radial density profiles n_e(r).

The script reports the relative L2 error of the recovered profile
against the ground-truth Gaussian — closing the loop proves the
renderer and the analysis stack agree about conventions (phase sign,
wavelength scaling, detector geometry), which is exactly what one needs
trust in before running the same backward chain on experimental data.

Usage: python examples/interferogram_to_density.py [-d 129] [-r 4000000]
(CPU smoke: -d 65 -r 1000000). Note: the coherent (complex Jones)
surface needs complex host<->device transfers, which the remote-attach
TPU service does not implement — run this one on CPU there (real local
TPUs are fine).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=129)
    p.add_argument("-r", type=int, default=4_000_000)
    p.add_argument("--ne0", type=float, default=1e24)
    p.add_argument("--w", type=float, default=2e-3)
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu.analysis.abel import invert_phase_map
    from synthpy_tpu.analysis.fringes import (
        phase_difference, rectify_phase_offset, unwrap_2d)
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.optics import Interferometry
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext, lwl, bin_scale = 5e-3, 1064e-9, 8
    d = ScalarDomain(2 * ext, args.d)
    # cylinder along x: ne varies only in (y, z)
    Y, Z = jnp.meshgrid(d.y, d.z, indexing="ij")
    prof = args.ne0 * jnp.exp(-(Y**2 + Z**2) / args.w**2)
    d.external_ne(jnp.broadcast_to(prof[None], (args.d,) * 3))
    d.phaseshift = True

    # beam wide enough that an annulus at its edge sees ~zero plasma
    # phase (rectification anchor for the unwrap offset)
    s0 = init_beam(jax.random.PRNGKey(0), args.r, 4.5e-3, 0.0, ext,
                   "circular")
    res = solve_zscan(s0, d, return_E=True, lwl=lwl)
    print(f"traced {args.r} rays in {res.duration:.2f}s", file=sys.stderr)

    # carrier must beat the plasma phase gradient for Takeda sideband
    # separation: 40 fringes across the 18 mm detector
    n_fringes, deg = 40, 20
    it = Interferometry(lwl, res.rf, res.Jf)
    it.two_lens_solve(n_fringes=n_fringes, deg=deg)
    H = np.asarray(it.interferogram(bin_scale=bin_scale))
    bkg = np.asarray(it.bkg(n_fringes=n_fringes, deg=deg,
                            bin_scale=bin_scale))

    # ---- backward chain (what one would run on experimental frames) ----
    # coherent images are (y_pixels, x_pixels): rows = detector y =
    # RADIAL direction (the cylinder axis lies along x = columns)
    wrapped = phase_difference(H, bkg)
    ny, nx = wrapped.shape
    px_r = 13.5 / ny  # mm per radial (row) pixel
    px_a = 18.0 / nx  # mm per axial (column) pixel
    # crop to the illuminated disc (r < 4.2 mm at M = 1)
    ir = int(4.2 / px_r)
    ia = int(4.2 / px_a)
    cr, ca = ny // 2, nx // 2
    crop = wrapped[cr - ir:cr + ir, ca - ia:ca + ia]
    unwrapped = unwrap_2d(crop, anchor=(ir, ia))
    # pixels with |y| in [3.5, 4.0] mm carry fringes but ~zero plasma
    # phase -> pin the global 2*pi*k offset there
    yy = (np.arange(crop.shape[0]) - ir) * px_r
    ring = (np.abs(yy) > 3.5) & (np.abs(yy) < 4.0)
    unwrapped = rectify_phase_offset(
        unwrapped, np.tile(ring[:, None], (1, crop.shape[1])))

    # axial columns within |x| < 1 mm of midplane -> radial profiles:
    # transpose so each Abel row runs along the radial (y) direction
    xs = (np.arange(crop.shape[1]) - ia) * px_a
    rows = unwrapped.T[np.abs(xs) < 1.0]
    # Takeda's two sidebands are conjugates — either is a valid carrier,
    # so extraction has a global sign ambiguity. Resolve it physically:
    # plasma only DELAYS the probe (n < 1), so in-plasma phase is < 0.
    if np.median(rows[:, ir - 5:ir + 5]) > 0:
        rows = -rows
    dr = px_r * 1e-3  # radial detector pixel in meters (M = 1)
    ne_r = np.asarray(invert_phase_map(rows, dr, lwl, axis_index=ir,
                                       reg=5e-3))
    ne_mean = ne_r.mean(axis=0)

    n = ne_mean.shape[0]
    r = (np.arange(n) + 0.5) * dr
    truth = args.ne0 * np.exp(-(r / args.w) ** 2)
    keep = r < 2 * args.w
    rel_l2 = float(np.linalg.norm(ne_mean[keep] - truth[keep])
                   / np.linalg.norm(truth[keep]))
    print(json.dumps({
        "dim": args.d, "rays": args.r,
        "peak_true_ne": args.ne0,
        "peak_recovered_ne": float(ne_mean[:5].mean()),
        "rel_l2_profile": round(rel_l2, 4),
        "rows_averaged": int(rows.shape[0]),
    }))
    if args.o:
        np.savez_compressed(args.o, interferogram=H, background=bkg,
                            phase=unwrapped, ne_r=ne_r, r=r, truth=truth)
        print(f"saved {args.o}", file=sys.stderr)


if __name__ == "__main__":
    main()
