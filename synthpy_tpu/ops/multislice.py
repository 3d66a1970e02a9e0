"""Multi-slice (split-step) wave propagation through a plasma volume.

Full-wave companion to the ray tracer: the volume is treated as a stack of
thin phase screens phi = k (n - 1) dz with angular-spectrum free-space
propagation between them — the standard split-step beam-propagation
method. The reference validated its coherent pipeline against exactly this
construction using the external ``diffractio`` package (phase screens +
multi-slice turbulence diffraction, evaluation/c.f._diffraction/
example_diffraction_turbulence.ipynb); here it is a first-class on-device
capability (a chain of FFTs — the op class TPUs are best at after matmul).

Use it to cross-check ray-traced coherent diagnostics in the weak-
diffraction limit, or as the primary model when diffraction inside the
volume matters (the ray tracer assumes rays, i.e. no intra-volume
diffraction).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu import constants
from synthpy_tpu.ops import dft


def angular_spectrum_step(U: jnp.ndarray, dz, lwl: float,
                          dx, dy) -> jnp.ndarray:
    """Exact free-space angular-spectrum propagation over distance dz."""
    nx, ny = U.shape
    fx = dft.fftfreq(nx, d=dx)
    fy = dft.fftfreq(ny, d=dy)
    FX, FY = jnp.meshgrid(fx, fy, indexing="ij")
    k = 2 * jnp.pi / lwl
    kz_sq = k**2 - (2 * jnp.pi * FX) ** 2 - (2 * jnp.pi * FY) ** 2
    kz = jnp.sqrt(jnp.maximum(kz_sq, 0.0))
    # evanescent components are suppressed rather than propagated
    H = jnp.where(kz_sq > 0, jnp.exp(1j * kz * dz), 0.0)
    return dft.ifft2(dft.fft2(U) * H)


def multislice_propagate(
    ne: jnp.ndarray,
    coords: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    lwl: float = constants.DEFAULT_LWL,
    *,
    input_field: Optional[jnp.ndarray] = None,
    probing_direction: str = "z",
    remove_carrier: bool = True,
) -> jnp.ndarray:
    """Propagate a coherent field through an n_e volume slice by slice.

    Args:
        ne: (nx, ny, nz) electron density [m^-3].
        coords: per-axis coordinate vectors.
        input_field: (na, nb) complex entry field (default: unit plane
            wave).
        probing_direction: volume axis to march along.
        remove_carrier: divide out the vacuum carrier exp(i k z) so the
            returned field holds only the plasma-induced modulation
            (matching the ray tracer's phase convention
            phi = omega (n-1) t).

    Returns:
        (na, nb) complex exit field.
    """
    ax = {"x": 0, "y": 1, "z": 2}[probing_direction]
    trans = [a for a in range(3) if a != ax]
    vol = jnp.moveaxis(ne, ax, -1)  # (na, nb, n_p)
    ca, cb = coords[trans[0]], coords[trans[1]]
    cp = coords[ax]
    dx = ca[1] - ca[0]
    dy = cb[1] - cb[0]
    dz = cp[1] - cp[0]

    omega = constants.omega_from_lwl(lwl)
    k = 2 * jnp.pi / lwl
    n_minus_1 = constants.n_refrac(vol, omega) - 1.0  # (na, nb, n_p)

    na, nb = vol.shape[0], vol.shape[1]
    U0 = (jnp.ones((na, nb), jnp.complex64) if input_field is None
          else jnp.asarray(input_field, jnp.complex64))

    def step(U, screen):
        U = U * jnp.exp(1j * (k * dz) * screen)
        U = angular_spectrum_step(U, dz, lwl, dx, dy)
        return U, None

    planes = jnp.moveaxis(n_minus_1, -1, 0)  # (n_p, na, nb)
    # one slab between consecutive planes, trapezoid-averaged: the physical
    # path is (n_p - 1) * dz, matching the ray tracer's line integral
    screens = 0.5 * (planes[:-1] + planes[1:])
    U, _ = jax.lax.scan(step, U0, screens)
    if remove_carrier:
        U = U * jnp.exp(-1j * k * dz * screens.shape[0])
    return U


def exit_intensity(U: jnp.ndarray) -> jnp.ndarray:
    """|U|^2 — the wave-optics shadowgram at the volume exit."""
    return jnp.abs(U) ** 2


def exit_phase(U: jnp.ndarray) -> jnp.ndarray:
    """Unwrapped-free exit phase of the modulation field."""
    return jnp.angle(U)
