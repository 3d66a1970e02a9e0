"""Isotropic power-spectrum estimators for generated fields.

Vectorised rebuild of the reference's src/utils/power_spectrum.py, which
ships three generations of estimators (linear k-bin fftshift version,
integer-shell binning with Python loops, and log-spaced radial bins).
Here a single implementation covers 1/2/3-D with either shell convention,
using bincount instead of loops — it runs on-device and is what the GRF
slope-recovery tests use (the reference validated its fields the same way,
test_SynthTurbulentFields.ipynb).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from synthpy_tpu.ops import dft


def radial_spectrum(
    field: jnp.ndarray,
    lengths,
    nbins: int = 0,
    log_bins: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shell-averaged power spectrum of an N-D real field.

    Args:
        field: real array (1/2/3-D).
        lengths: physical domain length per axis (scalar or per-axis).
        nbins: number of k bins (0 -> one bin per integer shell up to
            Nyquist, the reference's scalarND_knyquist convention,
            power_spectrum.py:194-323).
        log_bins: log-spaced bins (the reference's radial_NDspectrum
            convention, power_spectrum.py:327-469).

    Returns:
        (k_centers, E_k, counts): bin-centre wavenumber [rad/length],
        mean |F(k)|^2 per shell, and shell occupancy. The *mean* per shell
        estimates the point spectral density S(k) — for a field generated
        with amplitude sqrt(S(k)), E_k recovers S(k)'s slope directly.
    """
    ndim = field.ndim
    if jnp.ndim(lengths) == 0:
        lengths = (float(lengths),) * ndim
    shape = field.shape

    F = dft.fftn(field)
    P = jnp.abs(F) ** 2

    ks = [2 * jnp.pi * dft.fftfreq(n, d=length / n)
          for n, length in zip(shape, lengths)]
    kgrids = jnp.meshgrid(*ks, indexing="ij")
    kmag = jnp.sqrt(sum(g**2 for g in kgrids)).ravel()
    P = P.ravel()

    k_nyq = float(min(jnp.pi * n / length
                      for n, length in zip(shape, lengths)))
    k_min_pos = float(min(2 * jnp.pi / length for length in lengths))

    if nbins == 0:
        # integer shells in units of the fundamental
        nbins = max(int(k_nyq / k_min_pos), 1)
        edges = (jnp.arange(nbins + 1) + 0.5) * k_min_pos
    elif log_bins:
        edges = jnp.logspace(jnp.log10(k_min_pos * 0.5),
                             jnp.log10(k_nyq), nbins + 1)
    else:
        edges = jnp.linspace(0.0, k_nyq, nbins + 1)

    idx = jnp.clip(jnp.searchsorted(edges, kmag, side="right") - 1,
                   0, nbins - 1)
    in_range = (kmag >= edges[0]) & (kmag <= edges[-1])
    w = jnp.where(in_range, P, 0.0)
    ones = jnp.where(in_range, 1.0, 0.0)

    power = jnp.zeros(nbins).at[idx].add(w)
    counts = jnp.zeros(nbins).at[idx].add(ones)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, power / jnp.maximum(counts, 1.0), counts


def fit_spectral_slope(k, E_k, counts, k_lo: float, k_hi: float) -> float:
    """Least-squares log-log slope over occupied shells in [k_lo, k_hi]."""
    import numpy as np

    k = np.asarray(k)
    E = np.asarray(E_k)
    c = np.asarray(counts)
    mask = (k >= k_lo) & (k <= k_hi) & (c > 0) & (E > 0)
    lk, lE = np.log(k[mask]), np.log(E[mask])
    slope, _ = np.polyfit(lk, lE, 1)
    return float(slope)


def moving_average(a, n: int = 3):
    """Simple smoother (parity: reference power_spectrum.py:190)."""
    kernel = jnp.ones(n) / n
    return jnp.convolve(a, kernel, mode="valid")
