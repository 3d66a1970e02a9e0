"""Ray-transfer-matrix optics primitives.

Operates on (4, N) ray matrices [x, theta, y, phi] in mm/radians, mirroring
the reference's primitives (src/simulator/diagnostics.py:122-267 and
src/solvers-legacy/rtm_solver.py:84-136): thin lenses, free travel, and
filters that kill rays by setting them to NaN.

jit-friendliness: filters use jnp.where masks instead of boolean fancy
indexing, so every function traces with static shapes and the whole optical
train fuses into one XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def m_to_mm(r):
    """Scale position rows (0 and 2) from metres to mm."""
    return r.at[0::2, :].multiply(1e3)


def mm_to_m(r):
    """Scale position rows (0 and 2) from mm to metres."""
    return r.at[0::2, :].multiply(1e-3)


def lens(r, f1, f2):
    """Thin lens with focal lengths f1 (x) and f2 (y)."""
    L = jnp.zeros((4, 4), r.dtype)
    L = L.at[0, 0].set(1.0).at[1, 1].set(1.0)
    L = L.at[2, 2].set(1.0).at[3, 3].set(1.0)
    L = L.at[1, 0].set(-1.0 / f1).at[3, 2].set(-1.0 / f2)
    return L @ r


def sym_lens(r, f):
    """Axisymmetric thin lens."""
    return lens(r, f, f)


def travel(r, d):
    """Free-space propagation over distance d."""
    L = jnp.eye(4, dtype=r.dtype)
    L = L.at[0, 1].set(d).at[2, 3].set(d)
    return L @ r


def _kill(r, filt):
    """NaN-out the rays selected by ``filt`` (broadcast over rows)."""
    return jnp.where(filt[None, :], jnp.nan, r)


def circular_aperture(r, R, E=None):
    """Reject rays outside radius R (diagnostics.py:173-189)."""
    filt = r[0, :] ** 2 + r[2, :] ** 2 > R**2
    r = _kill(r, filt)
    if E is not None:
        E = jnp.where(filt[None, :], jnp.nan + 0.0j, E)
        return r, E
    return r


def circular_stop(r, R):
    """Reject rays inside radius R (dark-field stop)."""
    filt = r[0, :] ** 2 + r[2, :] ** 2 < R**2
    return _kill(r, filt)


def annular_stop(r, R1, R2):
    """Reject rays between radii R1 and R2.

    Unlike the reference (diagnostics.py:201-210, which returns only the
    mask), this applies the stop to the rays.
    """
    rho2 = r[0, :] ** 2 + r[2, :] ** 2
    filt = (rho2 > R1**2) & (rho2 < R2**2)
    return _kill(r, filt)


def rect_aperture(r, Lx, Ly, exact: bool = False):
    """Reject rays outside the 2*Lx x 2*Ly rectangle.

    Note: the reference ANDs the two out-of-bounds conditions
    (diagnostics.py:212-223), killing only rays outside BOTH half-widths —
    i.e. an aperture that only clips the corners. The default reproduces
    that exact behaviour for parity (like the ``atten_sign`` and
    ``legacy_mm_wavenumber`` bug-compat switches); pass ``exact=True``
    for a true rectangular aperture (OR of the bounds).
    """
    out_x = r[0, :] ** 2 > Lx**2
    out_y = r[2, :] ** 2 > Ly**2
    filt = (out_x | out_y) if exact else (out_x & out_y)
    return _kill(r, filt)


def knife_edge(r, offset, axis: str = "y", direction: int = 1):
    """Knife edge along ``axis`` ('x' -> row 0, 'y' -> row 2)."""
    a = {"x": 0, "y": 2}[axis]
    if direction == 0:
        raise ValueError("direction must be > 0 or < 0")
    filt = r[a, :] > offset if direction > 0 else r[a, :] < offset
    return _kill(r, filt)


def ray(x, theta, y, phi, dtype=jnp.float32):
    """A single (4, 1) ray (parity: diagnostics.py:258)."""
    return jnp.array([[x], [theta], [y], [phi]], dtype)


def d2r(d):
    """Degrees to radians."""
    return d * jnp.pi / 180.0
