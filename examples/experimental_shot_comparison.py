"""Register an experimental-style detector frame against its synthetic twin.

The reference's analysis culture is synthetic-vs-EXPERIMENTAL detector
images (reference src/utils/imaging.py:7-146 — orientation fixes, px/mm
scaling, profile_line — and evaluation/interferometry_testing): an
analyst loads a camera frame, fixes its orientation by eye, and overlays
profiles against the synthetic prediction. This example closes that loop
as a measured, automated workflow:

1. Forward: trace a cylindrical plasma column to a Mach-Zehnder
   interferogram + matching background (the synthetic "twin").
2. Make a "shot": the synthetic frame suffers what real frames suffer —
   a mount rotation, a beam walk-off, vignetting, Poisson shot noise and
   Gaussian read noise.
3. Register: `analysis.register` recovers the rotation + sub-pixel shift
   from windowed cross-correlation (no fiducials, no eyeballing); the
   shot is de-rotated/de-shifted onto the synthetic pixel grid.
4. Analyse BOTH frames with the same backward chain an experimentalist
   runs: Takeda demodulation -> anchored 2-D unwrap -> offset
   rectification -> inverse Abel -> n_e(r).
5. Compare: `Image.profile_line` overlays (axial phase profiles) and
   radial density curves, with the registration pose error and the
   shot-vs-synthetic density rel-L2 in the JSON record.

The coherent (complex Jones) surface needs complex host<->device
transfers the remote-attach TPU service lacks — run on CPU there (real
local TPUs are fine), like examples/interferogram_to_density.py.

Usage: python examples/experimental_shot_comparison.py [-d 97] [-r 2000000]
(CPU smoke: -d 65 -r 500000)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(globals().get("__file__", "examples/x.py"))), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "examples/x.py"))))


def backward_chain(H, bkg, px_r, px_a, lwl, crop_mm=4.2, band_mm=1.0):
    """Takeda -> unwrap -> rectify -> Abel: fringe frame to n_e(r).

    The exact chain of examples/interferogram_to_density.py, factored so
    the shot and the synthetic twin run through identical analysis.
    Returns (r [m], ne_mean(r), unwrapped phase crop).
    """
    from synthpy_tpu.analysis.abel import invert_phase_map
    from synthpy_tpu.analysis.fringes import (phase_difference,
                                              rectify_phase_offset,
                                              unwrap_2d)

    wrapped = phase_difference(jnp.asarray(H), jnp.asarray(bkg))
    ny, nx = wrapped.shape
    ir, ia = int(crop_mm / px_r), int(crop_mm / px_a)
    cr, ca = ny // 2, nx // 2
    crop = np.asarray(wrapped)[cr - ir:cr + ir, ca - ia:ca + ia]
    unwrapped = unwrap_2d(crop, anchor=(ir, ia))
    yy = (np.arange(crop.shape[0]) - ir) * px_r
    ring = (np.abs(yy) > 3.5) & (np.abs(yy) < 4.0)
    unwrapped = rectify_phase_offset(
        unwrapped, np.tile(ring[:, None], (1, crop.shape[1])))
    xs = (np.arange(crop.shape[1]) - ia) * px_a
    rows = unwrapped.T[np.abs(xs) < band_mm]
    if np.median(rows[:, ir - 5:ir + 5]) > 0:
        rows = -rows  # Takeda sideband sign ambiguity: plasma delays
    dr = px_r * 1e-3
    ne_r = np.asarray(invert_phase_map(rows, dr, lwl, axis_index=ir,
                                       reg=5e-3))
    r = (np.arange(ne_r.shape[1]) + 0.5) * dr
    return r, ne_r.mean(axis=0), unwrapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=97)
    p.add_argument("-r", type=int, default=2_000_000)
    p.add_argument("--ne0", type=float, default=1e24)
    p.add_argument("--w", type=float, default=2e-3)
    p.add_argument("--rot", type=float, default=2.3,
                   help="true mount rotation applied to the shot [deg]")
    p.add_argument("--walk", type=float, nargs=2, default=(4.6, -3.1),
                   help="true beam walk-off [px]")
    p.add_argument("--counts", type=float, default=400.0,
                   help="peak detector counts (Poisson scale)")
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu.analysis import Image, register
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.optics import Interferometry
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext, lwl, bin_scale = 5e-3, 1064e-9, 8
    d = ScalarDomain(2 * ext, args.d)
    Y, Z = jnp.meshgrid(d.y, d.z, indexing="ij")
    prof = args.ne0 * jnp.exp(-(Y**2 + Z**2) / args.w**2)
    d.external_ne(jnp.broadcast_to(prof[None], (args.d,) * 3))
    d.phaseshift = True

    s0 = init_beam(jax.random.PRNGKey(0), args.r, 4.5e-3, 0.0, ext,
                   "circular")
    res = solve_zscan(s0, d, return_E=True, lwl=lwl)
    print(f"traced {args.r} rays in {res.duration:.2f}s", file=sys.stderr)

    n_fringes, deg = 40, 20
    it = Interferometry(lwl, res.rf, res.Jf)
    it.two_lens_solve(n_fringes=n_fringes, deg=deg)
    H_syn = np.asarray(it.interferogram(bin_scale=bin_scale))
    bkg = np.asarray(it.bkg(n_fringes=n_fringes, deg=deg,
                            bin_scale=bin_scale))
    ny, nx = H_syn.shape
    px_r, px_a = 13.5 / ny, 18.0 / nx

    # ---- manufacture the "shot": pose error + camera noise ------------
    rng = np.random.default_rng(42)
    syn_im = Image(H_syn, mm_per_px=(px_a, px_r))
    moved = syn_im.rotate(args.rot).shift(*args.walk)
    yy, xx = np.mgrid[0:ny, 0:nx]
    vign = 1.0 - 0.15 * (((xx - nx / 2) / nx) ** 2
                         + ((yy - ny / 2) / ny) ** 2) * 4.0
    counts = np.clip(moved.data, 0, None) * vign
    counts *= args.counts / max(counts.max(), 1e-30)
    shot = rng.poisson(counts) + rng.normal(0.0, 2.0, counts.shape)
    shot_im = Image(shot, mm_per_px=(px_a, px_r))

    # ---- registration: recover the pose, no fiducials -----------------
    ang, (sx, sy), score = register(syn_im, shot_im, angle_range=(-8, 8))
    aligned = shot_im.rotate(-ang).shift(-sx, -sy)
    # the walk-off was applied after rotation, so its recovered value
    # lives in the de-rotated frame: compare against R(-ang) @ walk
    c, s = np.cos(np.deg2rad(-ang)), np.sin(np.deg2rad(-ang))
    exp_walk = (c * args.walk[0] + s * args.walk[1],
                -s * args.walk[0] + c * args.walk[1])

    # ---- identical backward chain on twin and aligned shot ------------
    # shot amplitude is in counts; the chain is scale-free (phase only)
    r_syn, ne_syn, ph_syn = backward_chain(H_syn, bkg, px_r, px_a, lwl)
    r_shot, ne_shot, ph_shot = backward_chain(aligned.data, bkg,
                                              px_r, px_a, lwl)

    truth = args.ne0 * np.exp(-(r_syn / args.w) ** 2)
    keep = r_syn < 2 * args.w
    # densities are ~1e24 f32: norms of differences overflow f32 — f64
    ne_syn, ne_shot = ne_syn.astype(np.float64), ne_shot.astype(np.float64)
    rel_syn = float(np.linalg.norm(ne_syn[keep] - truth[keep])
                    / np.linalg.norm(truth[keep]))
    rel_shot = float(np.linalg.norm(ne_shot[keep] - truth[keep])
                     / np.linalg.norm(truth[keep]))
    rel_cross = float(np.linalg.norm(ne_shot[keep] - ne_syn[keep])
                      / np.linalg.norm(ne_syn[keep]))

    # profile overlay through the column midplane (reference
    # imaging.profile_line workflow): raw-shot vs aligned-shot vs twin
    ph_syn_im = Image(ph_syn, mm_per_px=(px_a, px_r))
    ph_shot_im = Image(ph_shot, mm_per_px=(px_a, px_r))
    s_mm, prof_syn = ph_syn_im.profile_line((0.0, -3.5), (0.0, 3.5))
    _, prof_shot = ph_shot_im.profile_line((0.0, -3.5), (0.0, 3.5))
    prof_rel = float(np.linalg.norm(prof_shot - prof_syn)
                     / (np.linalg.norm(prof_syn) + 1e-30))

    rec = {
        "dim": args.d, "rays": args.r, "counts_peak": args.counts,
        "true_pose": {"rot_deg": args.rot, "walk_px": list(args.walk)},
        "recovered_pose": {"rot_deg": round(ang, 3),
                           "walk_px": [round(sx, 2), round(sy, 2)],
                           "score": round(score, 4)},
        "pose_err": {"rot_deg": round(abs(ang - args.rot), 3),
                     "walk_px": [round(abs(sx - exp_walk[0]), 2),
                                 round(abs(sy - exp_walk[1]), 2)]},
        "rel_l2_density_synthetic": round(rel_syn, 4),
        "rel_l2_density_shot": round(rel_shot, 4),
        "rel_l2_density_shot_vs_synthetic": round(rel_cross, 4),
        "rel_l2_phase_profile_shot_vs_synthetic": round(prof_rel, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    with open(os.path.join(_ROOT, "scratch",
                           "results_shot_comparison.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    if args.o:
        np.savez_compressed(
            args.o, synthetic=H_syn, shot=shot, aligned=aligned.data,
            background=bkg, phase_syn=ph_syn, phase_shot=ph_shot,
            r=r_syn, ne_syn=ne_syn, ne_shot=ne_shot, truth=truth,
            s_mm=s_mm, prof_syn=prof_syn, prof_shot=prof_shot)
        print(f"saved {args.o}", file=sys.stderr)


if __name__ == "__main__":
    main()
