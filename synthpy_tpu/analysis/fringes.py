"""Interferogram fringe analysis: carrier-sideband phase extraction.

The analysis-side complement to optics.Interferometry (the reference keeps
this workflow in evaluation/interferometry_testing/ notebooks): given a
fringe image I = A + B cos(k_c . r + phi(r)), the Takeda FFT method
isolates the +k_c sideband, shifts it to DC, and returns the wrapped
phase phi — the line-integrated plasma density map up to a constant.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def carrier_frequency(H: jnp.ndarray) -> Tuple[int, int]:
    """Locate the fringe carrier peak in the 2-D spectrum (host-side).

    Returns integer frequency indices (fi, fj) of the strongest
    non-DC component in the upper half-plane.
    """
    F = np.fft.fft2(np.asarray(H))
    mag = np.abs(F)
    ny, nx = mag.shape
    # mask the DC neighbourhood (wrapped 5x5)
    for di in (-2, -1, 0, 1, 2):
        for dj in (-2, -1, 0, 1, 2):
            mag[di % ny, dj % nx] = 0
    # keep one half-plane (the other holds the conjugate sideband):
    # rows ny//2.. are the negative-fi half; on the fi = 0 row keep only
    # positive fj
    mag[ny // 2 + 1:, :] = 0
    mag[0, nx // 2 + 1:] = 0
    fi, fj = np.unravel_index(np.argmax(mag), mag.shape)
    return int(fi), int(fj)


def extract_phase(
    H: jnp.ndarray,
    carrier: Optional[Tuple[int, int]] = None,
    filter_radius: float = 0.5,
) -> np.ndarray:
    """Wrapped phase map from a fringe image (Takeda et al. 1982).

    Args:
        H: (ny, nx) interferogram.
        carrier: integer carrier frequency indices; auto-detected if None.
        filter_radius: sideband filter half-width as a fraction of the
            carrier frequency magnitude.

    Returns:
        (ny, nx) wrapped phase in (-pi, pi].
    """
    H = np.asarray(H, np.float64)
    ny, nx = H.shape
    if carrier is None:
        carrier = carrier_frequency(H)
    fi, fj = carrier

    F = np.fft.fft2(H - H.mean())
    # band-pass around the carrier
    wy = np.fft.fftfreq(ny)[:, None]
    wx = np.fft.fftfreq(nx)[None, :]
    cy = np.fft.fftfreq(ny)[fi]
    cx = np.fft.fftfreq(nx)[fj]
    rad = filter_radius * np.hypot(cy, cx)
    mask = ((wy - cy) ** 2 + (wx - cx) ** 2) < rad**2
    side = F * mask

    # shift carrier to DC by rolling the spectrum
    side = np.roll(np.roll(side, -fi, axis=0), -fj, axis=1)
    analytic = np.fft.ifft2(side)
    return np.angle(analytic)


def unwrap_1d(phase: np.ndarray, axis: int = -1) -> np.ndarray:
    """Simple 1-D phase unwrapping along an axis (numpy.unwrap wrapper)."""
    return np.unwrap(phase, axis=axis)


def phase_difference(H_shot: jnp.ndarray, H_bkg: jnp.ndarray,
                     carrier: Optional[Tuple[int, int]] = None
                     ) -> np.ndarray:
    """Background-subtracted wrapped phase: the plasma-only contribution.

    Uses the background interferogram's carrier for both extractions so
    the reference tilt cancels exactly (the standard shot/bkg workflow the
    reference's Interferometry.bkg supports).
    """
    if carrier is None:
        carrier = carrier_frequency(H_bkg)
    p_shot = extract_phase(H_shot, carrier)
    p_bkg = extract_phase(H_bkg, carrier)
    return np.angle(np.exp(1j * (p_shot - p_bkg)))
