"""Synthetic diagnostics: optical trains + detectors.

Rebuilds the reference's diagnostic classes (src/simulator/
diagnostics.py:269-641 and src/solvers-legacy/rtm_solver.py:139-453):
``Shadowgraphy``, ``Schlieren`` (dark/light field), ``Refractometry``
(incoherent, coherent, Fresnel) and ``Interferometry`` on a shared
``Diagnostic`` base holding the optical-bench geometry (lens scale L,
lens radius R, detector Lx x Ly — defaults model a KAF-8300 sensor behind
f = L/2 optics).

Detector binning is scatter-add (synthpy_tpu.ops.histogram): the incoherent
``histogram`` replaces jnp.histogram2d + NaN masking (diagnostics.py:323-353)
and the coherent ``complex histogram`` replaces the reference's Python loop
over rays (histogram_legacy, diagnostics.py:358-379).

Unit conventions: ray positions in mm on the bench (converted from the
tracer's metres on entry, diagnostics.py:313), wavelength in metres.
Deviations from the reference, each deliberate:
  * ``propagate_E`` converts the transverse path to metres before applying
    k = 2*pi/lambda — the reference multiplies a 1/m wavenumber by a mm
    path (diagnostics.py:315-321), overstating phases by 1e3.
  * coherent binning uses symmetric detector ranges [-L/2, L/2]; the
    reference's integer-division edges (-Ly//2 with Ly = 13.5 gives
    [-7, 6], diagnostics.py:362-363) are asymmetric by accident.
  * ``Interferometry.bkg`` synthesises the unperturbed background beam from
    unit-amplitude/zero-phase Jones vectors at the same ray positions; the
    reference version references an undefined variable and cannot run
    (diagnostics.py:583-612).
  * ``Refractometry.fresnel_solve`` returns the propagated field's intensity
    on the deposition grid; the reference indexes the propagated 2-D grid
    as if it were per-ray Jones components (diagnostics.py:542-548).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from synthpy_tpu.ops import fresnel as fresnel_ops
from synthpy_tpu.ops.histogram import complex_histogram, histogram2d
from synthpy_tpu.optics.rtm import (
    circular_aperture,
    circular_stop,
    lens,
    m_to_mm,
    rect_aperture,
    sym_lens,
    travel,
)


class Diagnostic:
    """Base class: bench geometry, detector, and E-field bookkeeping.

    Args:
        wavelength: probe wavelength [m].
        rf: (4, N) exit rays [x, theta, y, phi] in METRES/radians, as
            returned by tracer.solve.
        Jf: optional (2, N) complex Jones vectors (coherent diagnostics).
        focal_plane: object-plane offset [mm] (diagnostics.py:275).
        L: bench length scale [mm]; first lens sits at L.
        R: lens radius [mm].
        Lx, Ly: detector size [mm] (KAF-8300 defaults 18 x 13.5).
        x, y, x_l, y_l, amp, phase: optional deposition grid + per-ray
            amplitude/phase for the Fresnel refractometer.
        legacy_mm_wavenumber: bug-compat switch. The reference's
            ``propagate_E`` multiplies a 1/m wavenumber by a path in MM
            (diagnostics.py:315-321), overstating inter-element phases by
            1e3; this rebuild converts the path to metres first. Set True
            to reproduce the reference's convention bit-for-bit, for
            legacy-vs-rebuild interferogram cross-validation.
    """

    def __init__(self, wavelength, rf, Jf=None, *, focal_plane: float = 0,
                 L: float = 400, R: float = 25, Lx: float = 18,
                 Ly: float = 13.5, x=None, y=None, x_l=None, y_l=None,
                 amp=None, phase=None, legacy_mm_wavenumber: bool = False):
        if rf is None:
            raise ValueError("rf must not be None")
        self.wavelength = wavelength
        self.focal_plane, self.L, self.R = focal_plane, L, R
        self.Lx, self.Ly = Lx, Ly
        self.x, self.y, self.x_l, self.y_l = x, y, x_l, y_l
        self.amp, self.phase = amp, phase
        self.legacy_mm_wavenumber = legacy_mm_wavenumber

        self.Jf = jnp.asarray(Jf) if Jf is not None else None
        self.r0 = m_to_mm(jnp.asarray(rf))
        self.rf = self.r0
        self.H = None
        self.xedges = None
        self.yedges = None

    # -- E-field propagation between elements --------------------------------

    def propagate_E(self, r1, r0):
        """Advance Jones phases by k * transverse path between two planes."""
        scale = 1.0 if self.legacy_mm_wavenumber else 1e-3  # mm -> m
        dx = (r1[0, :] - r0[0, :]) * scale
        dy = (r1[2, :] - r0[2, :]) * scale
        k = 2 * jnp.pi / self.wavelength
        path = jnp.sqrt(dx**2 + dy**2)
        self.Jf = self.Jf * jnp.exp(1.0j * k * path)

    # -- detectors ------------------------------------------------------------

    def histogram(self, bin_scale: int = 1, pix_x: int = 3448,
                  pix_y: int = 2574, clear_mem: bool = False):
        """Incoherent ray-count detector image (diagnostics.py:323-353)."""
        self.H, self.xedges, self.yedges = histogram2d(
            self.rf[0, :], self.rf[2, :],
            bins=(pix_x // bin_scale, pix_y // bin_scale),
            range_=((-self.Lx / 2, self.Lx / 2), (-self.Ly / 2, self.Ly / 2)))
        if clear_mem:
            self.clear_rays()
        return self.H

    def coherent_histogram(self, bin_scale: int = 1, pix_x: int = 3448,
                           pix_y: int = 2574, clear_mem: bool = False,
                           convention: str = "legacy"):
        """Coherent complex-amplitude detector image (replaces
        histogram_legacy, diagnostics.py:358-379).

        ``convention="legacy"`` reproduces the reference's
        sqrt(Re^2+Re^2) amplitude (diagnostics.py:377);
        ``"intensity"`` gives the physically-standard |sum a|^2."""
        if self.Jf is None:
            raise RuntimeError("coherent detector requires Jones vectors")
        self.H = complex_histogram(
            self.rf[0, :], self.rf[2, :], self.Jf[0, :], self.Jf[1, :],
            pix_x // bin_scale, pix_y // bin_scale, self.Lx, self.Ly,
            convention=convention)
        if clear_mem:
            self.clear_rays()
        return self.H

    # kept under the reference's name for drop-in compatibility
    histogram_legacy = coherent_histogram

    def plot(self, ax, clim=None, cmap=None):
        extent = None
        if self.xedges is not None:
            extent = [float(self.xedges[0]), float(self.xedges[-1]),
                      float(self.yedges[0]), float(self.yedges[-1])]
        return ax.imshow(np.asarray(self.H), interpolation="nearest",
                         origin="lower", clim=clim, cmap=cmap, extent=extent)

    def clear_rays(self):
        self.r0 = None
        self.rf = None
        self.Jf = None


class Shadowgraphy(Diagnostic):
    """Shadowgraphy bench (diagnostics.py:381-405)."""

    def single_lens_solve(self):
        """Single lens, M ~ 2 (real experimental layout)."""
        r1 = travel(self.r0, 3 * self.L / 4 - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L / 2)
        self.rf = travel(r3, 3 * self.L / 2)
        return self.rf

    def two_lens_solve(self):
        """Two-lens telescope, M = 1."""
        r1 = travel(self.r0, self.L - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L / 2)
        r4 = travel(r3, self.L * 2)
        r5 = circular_aperture(r4, self.R)
        r6 = sym_lens(r5, self.L / 2)
        self.rf = travel(r6, self.L)
        return self.rf

    def single_exp_solve(self, detL: float = 400):
        """Single lens with a variable detector arm (M ~ detL/(L/2) - 1,
        the real experimental layout; legacy rtm_solver.py:216-222). The
        object plane sits at L (no focal_plane offset, matching the
        legacy solver exactly)."""
        r1 = travel(self.r0, self.L)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L / 2)
        self.rf = travel(r3, detL)
        return self.rf

    # default solve = the experimentally used single-lens system
    solve = single_lens_solve


class Polarimetry(Diagnostic):
    """Faraday-rotation imaging polarimeter (beyond the reference's four
    benches — its Faraday physics stops at the pol channel,
    full_solver.py:532-541; this is the pol channel's detector-side
    consumer, the diagnostic MAGPIE fields as Faraday imaging).

    Images the plasma through an M = 1 telescope (the shadowgraphy
    two-lens geometry) with a linear analyser in front of the detector.
    The analyser is not a ray-transfer element: polarisation rides the
    Jones vector untouched by lenses/apertures, so the analyser becomes a
    per-ray intensity weight at binning time,

        I_ray = |Jx sin(beta) + Jy cos(beta)|^2
              = amp^2 cos^2(pol + beta)

    for the tracer's R(pol) @ y-hat polarisation convention
    (tracer.propagator.ray_to_Jonesvector). ``beta`` is the analyser
    angle from the initial (y) polarisation axis: beta = 90 deg is
    crossed (extinction without plasma), and the standard working point
    a few degrees off extinction (default 85 deg) gives signed
    sensitivity to the rotation angle.
    """

    def two_lens_solve(self):
        """M = 1 imaging telescope (same train as Shadowgraphy)."""
        r1 = travel(self.r0, self.L - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L / 2)
        r4 = travel(r3, self.L * 2)
        r5 = circular_aperture(r4, self.R)
        r6 = sym_lens(r5, self.L / 2)
        self.rf = travel(r6, self.L)
        return self.rf

    solve = two_lens_solve

    def polarogram(self, beta_deg: float = 85.0, bin_scale: int = 1,
                   pix_x: int = 3448, pix_y: int = 2574,
                   clear_mem: bool = False):
        """Analyser-weighted detector image at analyser angle ``beta_deg``.

        Linear in rays (a weighted incoherent histogram), so images sum
        exactly across ray batches. Divide two polarograms at different
        analyser angles to recover the rotation map (see
        ``analysis.fringes`` for the interferometric analogue).
        """
        if self.Jf is None:
            raise RuntimeError("polarogram requires Jones vectors "
                               "(trace with return_E=True and B_on)")
        from synthpy_tpu.optics.compose import analyser_weight

        w = analyser_weight(self.Jf, beta_deg, self.rf.dtype)
        self.H, self.xedges, self.yedges = histogram2d(
            self.rf[0, :], self.rf[2, :],
            bins=(pix_x // bin_scale, pix_y // bin_scale),
            range_=((-self.Lx / 2, self.Lx / 2),
                    (-self.Ly / 2, self.Ly / 2)),
            weights=w)
        if clear_mem:
            self.clear_rays()
        return self.H


class Schlieren(Diagnostic):
    """Dark/light-field schlieren bench (diagnostics.py:407-458)."""

    def DF_solve(self, R: float = 1):
        """Dark field: stop of radius R at the first lens's focal plane
        blocks undeflected rays; only rays with |angle| > R/L pass."""
        r1 = travel(self.r0, self.L - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L)
        r4 = travel(r3, self.L)
        r5 = circular_stop(r4, R=R)
        r6 = travel(r5, self.L)
        r7 = circular_aperture(r6, self.R)
        r8 = sym_lens(r7, self.L)
        self.rf = travel(r8, self.L)
        return self.rf

    def LF_solve(self, R: float = 1):
        """Light field: aperture instead of stop — only undeflected rays."""
        r1 = travel(self.r0, self.L - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L)
        r4 = travel(r3, self.L)
        r5 = circular_aperture(r4, R)
        r6 = travel(r5, self.L)
        r7 = circular_aperture(r6, self.R)
        r8 = sym_lens(r7, self.L)
        self.rf = travel(r8, self.L)
        return self.rf

    solve = DF_solve


class Refractometry(Diagnostic):
    """Imaging refractometer (diagnostics.py:460-552): spherical lens then
    hybrid astigmatic lens — spatial axis imaged, angular axis dispersed."""

    def incoherent_solve(self):
        r1 = travel(self.r0, 3 * self.L / 4 - self.focal_plane)
        r2 = circular_aperture(r1, self.R)
        r3 = sym_lens(r2, self.L / 2)
        r4 = travel(r3, 3 * self.L / 2)
        r5 = rect_aperture(r4, 15, 30)
        r6 = circular_aperture(r5, self.R)
        r7 = lens(r6, self.L / 3, self.L / 2)
        self.rf = travel(r7, self.L)
        return self.rf

    def coherent_solve(self):
        """As incoherent_solve but advancing the Jones phase between every
        element (diagnostics.py:505-524)."""
        r1 = travel(self.r0, 3 * self.L / 4 - self.focal_plane)
        r2, self.Jf = circular_aperture(r1, self.R, E=self.Jf)
        self.propagate_E(r2, r1)
        r3 = sym_lens(r2, self.L / 2)
        self.propagate_E(r3, r2)
        r4 = travel(r3, 3 * self.L / 2)
        self.propagate_E(r4, r3)
        r5, self.Jf = circular_aperture(r4, self.R, E=self.Jf)
        r6 = lens(r5, self.L / 3, self.L / 2)
        self.propagate_E(r6, r5)
        self.rf = travel(r6, self.L)
        self.propagate_E(self.rf, r6)
        return self.rf

    def refractogram(self, bin_scale: int = 1, pix_x: int = 3448,
                     pix_y: int = 2574, clear_mem: bool = False,
                     speckle_phase: float = 0.0, key=None,
                     convention: str = "legacy"):
        """Coherent refractogram. ``speckle_phase`` adds the legacy
        +-sigma random per-ray phase (rtm_solver.py:359-364)."""
        if speckle_phase > 0.0:
            import jax

            if key is None:
                key = jax.random.PRNGKey(0)
            ph = speckle_phase * jax.random.normal(key, self.Jf.shape[1:])
            self.Jf = self.Jf * jnp.exp(1.0j * ph)
        return self.coherent_histogram(bin_scale=bin_scale, pix_x=pix_x,
                                       pix_y=pix_y, clear_mem=clear_mem,
                                       convention=convention)

    def fresnel_solve(self, z: Optional[float] = None, pad_factor: int = 2):
        """Full-wave hybrid: deposit per-ray amp/phase on the (x, y) grid,
        Fresnel-propagate distance z [m], store the intensity as H."""
        if any(v is None for v in (self.x, self.y, self.x_l, self.y_l,
                                   self.amp, self.phase)):
            raise RuntimeError(
                "fresnel_solve needs x, y, x_l, y_l, amp, phase at init")
        if z is None:
            z = (3 * self.L / 4 - self.focal_plane) * 1e-3
        U = fresnel_ops.propagate(
            self.wavelength, self.x, self.y, self.x_l, self.y_l,
            self.r0, self.amp, self.phase, z, pad_factor=pad_factor)
        self.U = U
        self.H = jnp.abs(U) ** 2
        return self.H

    def resample_to_detector(self, bin_scale: int = 1, pix_x: int = 3448,
                             pix_y: int = 2574):
        """Bilinear-resample the Fresnel intensity onto the detector grid.

        Maps the propagated |U|^2 (which lives on the deposition grid
        ``self.x`` x ``self.y``) onto the same (ny, nx) pixel layout the
        ray-counting ``histogram`` produces, so fresnel images drop into
        the identical analysis pipeline. Pixels outside the deposition
        extent read 0. The reference's fresnel path has no detector
        resampling — it stops at the deposition grid
        (diagnostics.py:529-552, fresnel_integral.py:61-94).
        """
        if self.H is None or self.x is None or self.y is None:
            raise RuntimeError("run fresnel_solve first")
        nx_px, ny_px = pix_x // bin_scale, pix_y // bin_scale
        xq = ((jnp.arange(nx_px) + 0.5) / nx_px - 0.5) * self.Lx
        yq = ((jnp.arange(ny_px) + 0.5) / ny_px - 0.5) * self.Ly
        x0, y0 = self.x[0], self.y[0]
        dxg, dyg = self.x[1] - self.x[0], self.y[1] - self.y[0]
        tx = (xq - x0) / dxg
        ty = (yq - y0) / dyg
        nx_g, ny_g = self.H.shape
        TX, TY = jnp.meshgrid(tx, ty, indexing="xy")     # (ny_px, nx_px)
        valid = ((TX >= 0) & (TX <= nx_g - 1)
                 & (TY >= 0) & (TY <= ny_g - 1))
        ix = jnp.clip(jnp.floor(TX).astype(jnp.int32), 0, nx_g - 2)
        iy = jnp.clip(jnp.floor(TY).astype(jnp.int32), 0, ny_g - 2)
        fx = jnp.clip(TX - ix, 0.0, 1.0)
        fy = jnp.clip(TY - iy, 0.0, 1.0)
        H = self.H
        img = ((1 - fx) * (1 - fy) * H[ix, iy]
               + fx * (1 - fy) * H[ix + 1, iy]
               + (1 - fx) * fy * H[ix, iy + 1]
               + fx * fy * H[ix + 1, iy + 1])
        return jnp.where(valid, img, 0.0)


class Interferometry(Diagnostic):
    """Mach-Zehnder-style interferometry (diagnostics.py:554-641)."""

    def interfere_ref_beam(self, n_fringes: float, deg: float):
        """Add a tilted plane-wave reference beam to the y polarisation.

        ``deg`` is the fringe angle from vertical; ``n_fringes`` sets the
        fringe spatial frequency 2*n_fringes/3 rad/mm on the detector
        (reference diagnostics.py:559-581, with its deg >= 45 flip).
        """
        if self.Jf is None:
            raise RuntimeError("interferometry requires Jones vectors")
        if deg >= 45:
            deg = -abs(deg - 90)
        rad = deg * jnp.pi / 180.0
        y_weight = jnp.sin(rad)
        x_weight = jnp.cos(rad)
        ref = jnp.exp(2 * n_fringes / 3 * 1.0j
                      * (x_weight * self.rf[0, :] + y_weight * self.rf[2, :]))
        self.Jf = self.Jf.at[1, :].add(ref)
        return self.Jf

    def two_lens_solve(self, n_fringes: float = 10, deg: float = 20,
                       interfere: bool = True):
        """Recombine with the reference beam at the domain exit, then image
        through the M = 1 telescope with phase propagation."""
        if interfere:
            self.interfere_ref_beam(n_fringes, deg)
        r1 = travel(self.r0, self.L - self.focal_plane)
        self.propagate_E(r1, self.r0)
        r2, self.Jf = circular_aperture(r1, self.R, E=self.Jf)
        r3 = sym_lens(r2, self.L / 2)
        self.propagate_E(r3, r2)
        r4 = travel(r3, self.L * 2)
        self.propagate_E(r4, r3)
        r5, self.Jf = circular_aperture(r4, self.R, E=self.Jf)
        r6 = sym_lens(r5, self.L / 2)
        self.propagate_E(r6, r5)
        r7 = travel(r6, self.L)
        self.propagate_E(r7, r6)
        self.rf = r7
        return self.rf

    def bkg(self, n_fringes: float = 10, deg: float = 20,
            bin_scale: int = 1, pix_x: int = 3448, pix_y: int = 2574):
        """Background fringe pattern: the same bench fed with unit-amplitude,
        zero-phase light at the same ray positions."""
        E_saved, rf_saved = self.Jf, self.rf
        Np = self.r0.shape[1]
        self.rf = self.r0
        self.Jf = jnp.stack([jnp.zeros(Np, jnp.complex64),
                             jnp.ones(Np, jnp.complex64)])
        self.two_lens_solve(n_fringes=n_fringes, deg=deg)
        self.coherent_histogram(bin_scale=bin_scale, pix_x=pix_x,
                                pix_y=pix_y)
        self.bkg_signal = self.H
        self.Jf, self.rf = E_saved, rf_saved
        return self.bkg_signal

    def interferogram(self, bin_scale: int = 1, pix_x: int = 3448,
                      pix_y: int = 2574, clear_mem: bool = False,
                      convention: str = "legacy"):
        return self.coherent_histogram(bin_scale=bin_scale, pix_x=pix_x,
                                       pix_y=pix_y, clear_mem=clear_mem,
                                       convention=convention)
