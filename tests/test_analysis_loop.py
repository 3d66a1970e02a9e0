"""Integration gate for the full synthetic analysis loop:

trace a cylindrical plasma column -> Mach-Zehnder interferogram +
background -> Takeda demodulation -> anchored unwrap -> inverse Abel ->
radial n_e(r) compared against the ground-truth Gaussian. This is the
chain an experimentalist runs on camera frames; closing it proves the
renderer and the analysis stack agree on phase sign, wavelength scaling
and detector geometry (examples/interferogram_to_density.py is the
full-size version).
"""

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.analysis.abel import invert_phase_map
from synthpy_tpu.analysis.fringes import (
    phase_difference, rectify_phase_offset, unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.optics import Interferometry
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import solve_zscan


def test_interferogram_to_density_loop():
    # bin_scale 8: at 16 the plasma's radial phase gradient (0.09
    # cycles/px) exceeds the carrier's y-component (0.06) and Takeda's
    # sideband filter clips the phase (measured: centre -4.3 vs true
    # -10.6 rad); at 8 the gradient halves and recovery is clean
    ext, lwl, bs = 5e-3, 1064e-9, 8
    dim, rays, ne0, w = 49, 400_000, 1e24, 2e-3
    d = ScalarDomain(2 * ext, dim)
    Y, Z = jnp.meshgrid(d.y, d.z, indexing="ij")
    d.external_ne(jnp.broadcast_to(
        (ne0 * jnp.exp(-(Y**2 + Z**2) / w**2))[None], (dim,) * 3))
    d.phaseshift = True

    s0 = init_beam(jax.random.PRNGKey(0), rays, 4.5e-3, 0.0, ext,
                   "circular")
    res = solve_zscan(s0, d, return_E=True, lwl=lwl)
    it = Interferometry(lwl, res.rf, res.Jf)
    it.two_lens_solve(n_fringes=40, deg=20)
    H = np.asarray(it.interferogram(bin_scale=bs))
    bkg = np.asarray(it.bkg(n_fringes=40, deg=20, bin_scale=bs))

    wrapped = phase_difference(H, bkg)
    ny, nx = wrapped.shape  # (y, x): rows radial, columns = cylinder axis
    px_r, px_a = 13.5 / ny, 18.0 / nx
    ir, ia = int(4.2 / px_r), int(4.2 / px_a)
    crop = wrapped[ny // 2 - ir:ny // 2 + ir, nx // 2 - ia:nx // 2 + ia]
    uw = unwrap_2d(crop, anchor=(ir, ia))
    yy = (np.arange(crop.shape[0]) - ir) * px_r
    ring = (np.abs(yy) > 3.5) & (np.abs(yy) < 4.0)
    uw = rectify_phase_offset(uw, np.tile(ring[:, None],
                                          (1, crop.shape[1])))

    xs = (np.arange(crop.shape[1]) - ia) * px_a
    rows = uw.T[np.abs(xs) < 1.0]
    if np.median(rows[:, ir - 4:ir + 4]) > 0:  # Takeda sideband sign
        rows = -rows
    ne_r = np.asarray(invert_phase_map(rows, px_r * 1e-3, lwl,
                                       axis_index=ir, reg=5e-3))
    ne_mean = ne_r.mean(axis=0)

    r = (np.arange(ne_mean.shape[0]) + 0.5) * px_r * 1e-3
    truth = ne0 * np.exp(-(r / w) ** 2)
    keep = r < 2 * w
    rel_l2 = (np.linalg.norm(ne_mean[keep] - truth[keep])
              / np.linalg.norm(truth[keep]))
    assert rel_l2 < 0.25, f"analysis loop rel_l2 {rel_l2:.3f}"
    # the peak must be quantitatively right, not just shaped right
    np.testing.assert_allclose(ne_mean[:4].mean(), ne0, rtol=0.3)
