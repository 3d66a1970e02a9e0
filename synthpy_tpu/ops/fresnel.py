"""Fresnel / angular-spectrum diffraction propagation on-device.

jnp rebuild of the reference's NumPy/SciPy pipeline (src/simulator/
fresnel_integral.py): reflect-pad + 2-D Tukey window, FFT2, Fresnel
transfer function H = exp(-i pi lambda z (fx^2 + fy^2)), optional Gaussian
LANEX PSF in the Fourier domain, inverse FFT, crop.

The scattered-ray -> grid step replaces scipy's LinearNDInterpolator
(fresnel_integral.py:72-78) with cloud-in-cell deposition
(synthpy_tpu.ops.histogram.deposit_cic) — the adjoint of bilinear
interpolation — which runs entirely on-device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from synthpy_tpu.ops import dft
from synthpy_tpu.ops.histogram import deposit_cic


def tukey(M: int, alpha: float = 0.5) -> jnp.ndarray:
    """Tukey (tapered cosine) window, matching scipy.signal.windows.tukey."""
    if alpha <= 0:
        return jnp.ones(M)
    if alpha >= 1:
        alpha = 1.0
    n = jnp.arange(M)
    width = alpha * (M - 1) / 2.0
    w = jnp.ones(M)
    rising = 0.5 * (1 + jnp.cos(jnp.pi * (n / width - 1.0)))
    falling = 0.5 * (1 + jnp.cos(jnp.pi * ((n - (M - 1 - width)) / width)))
    w = jnp.where(n < width, rising, w)
    w = jnp.where(n > (M - 1) - width, falling, w)
    return w


def prepare_field_for_propagation(U0: jnp.ndarray, pad_factor: int = 2,
                                  alpha: float = 0.4) -> jnp.ndarray:
    """Reflect-pad by pad_factor*shape per side and apply a 2-D Tukey window
    (parity: fresnel_integral.py:7-22)."""
    px = U0.shape[0] * pad_factor
    py = U0.shape[1] * pad_factor
    U = jnp.pad(U0, ((px, px), (py, py)), mode="reflect")
    w2d = jnp.outer(tukey(U.shape[0], alpha), tukey(U.shape[1], alpha))
    return U * w2d


def fresnel_propagate(
    U0_prepared: jnp.ndarray,
    L: Tuple[float, float],
    wavelength: float,
    z: float,
    original_shape: Tuple[int, int],
    pad_factor: int = 2,
    lanex_fwhm_m: Optional[float] = None,
) -> jnp.ndarray:
    """Propagate a prepared field a distance z (fresnel_integral.py:25-59).

    Args:
        U0_prepared: padded+windowed complex field.
        L: physical side lengths (Lx, Ly) of the ORIGINAL (uncropped) field.
        wavelength, z: metres.
        original_shape: shape before padding; the result is cropped back
            to it.
        lanex_fwhm_m: optional Gaussian PSF FWHM applied in Fourier space.
    """
    Nx, Ny = original_shape
    dx, dy = L[0] / Nx, L[1] / Ny

    fx = dft.fftfreq(U0_prepared.shape[0], d=dx)
    fy = dft.fftfreq(U0_prepared.shape[1], d=dy)
    FX, FY = jnp.meshgrid(fx, fy, indexing="ij")

    H = jnp.exp(-1j * jnp.pi * wavelength * z * (FX**2 + FY**2))
    Uz_ft = dft.fft2(U0_prepared) * H

    if lanex_fwhm_m is not None and lanex_fwhm_m > 0:
        sigma = lanex_fwhm_m / (2 * jnp.sqrt(2 * jnp.log(2.0)))
        Uz_ft = Uz_ft * jnp.exp(-2 * (jnp.pi * sigma) ** 2 * (FX**2 + FY**2))

    Uz = dft.ifft2(Uz_ft) * jnp.exp(1j * (2 * jnp.pi / wavelength) * z) \
        / (1j * wavelength * z)

    sx, sy = Nx * pad_factor, Ny * pad_factor
    return Uz[sx:sx + Nx, sy:sy + Ny]


def propagate(
    lwl: float,
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_length: float,
    y_length: float,
    rays: jnp.ndarray,
    amplitudes: jnp.ndarray,
    phases: jnp.ndarray,
    z: float,
    pad_factor: int = 2,
) -> jnp.ndarray:
    """Scatter per-ray amplitude/phase to a grid and Fresnel-propagate.

    Parity surface of fresnel_integral.propagate (fresnel_integral.py:61-94):
    rays[0] / rays[2] give transverse ray positions; amplitude and phase are
    deposited separately onto (x, y) grid nodes, combined as
    U0 = A * exp(-i phase), then propagated distance z.

    Returns:
        Complex field on the (x, y) grid after propagation.
    """
    amp_grid = deposit_cic(rays[0, :], rays[2, :], amplitudes, x, y)
    phase_grid = deposit_cic(rays[0, :], rays[2, :], phases, x, y)
    U0 = amp_grid * jnp.exp(-1j * phase_grid)
    U0p = prepare_field_for_propagation(U0, pad_factor=pad_factor)
    return fresnel_propagate(U0p, (x_length, y_length), lwl, z, U0.shape,
                             pad_factor=pad_factor)


def fresnel_number(x_length: float, lwl: float, z: float) -> float:
    """N_f = a^2 / (lambda z) (fresnel_integral.py:66)."""
    return x_length**2 / (lwl * z)
