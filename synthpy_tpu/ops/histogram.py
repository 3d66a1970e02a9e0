"""Detector binning as scatter-add — no Python loops, no host round-trips.

Replaces both detector paths of the reference:

* ``Diagnostic.histogram`` — NaN-masked ``jnp.histogram2d`` (reference
  src/simulator/diagnostics.py:323-353). Reimplemented as index arithmetic +
  ``.at[...].add`` so it fuses into the jitted pipeline, shards over the ray
  axis, and reduces with a psum instead of the reference's MPI
  ``comm.reduce(H, op=SUM)`` (pvti_trace_mpi.py:169-170).

* ``Diagnostic.histogram_legacy`` — a Python for-loop over rays accumulating
  complex Jones amplitudes per pixel (diagnostics.py:358-379, the #2 hot spot
  of the reference). Here: one complex scatter-add.

Conventions match numpy.histogram2d: values on the rightmost edge fall in the
last bin; NaN positions (rays killed by apertures) are dropped.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _bin_index(v: jnp.ndarray, lo: float, hi: float, nbins: int):
    """(index, valid) for numpy.histogram-compatible binning."""
    scale = nbins / (hi - lo)
    idx = jnp.floor((v - lo) * scale).astype(jnp.int32)
    # numpy puts v == hi into the last bin.
    idx = jnp.where(v == hi, nbins - 1, idx)
    valid = jnp.isfinite(v) & (v >= lo) & (v <= hi)
    return jnp.clip(idx, 0, nbins - 1), valid


def histogram2d(
    x: jnp.ndarray,
    y: jnp.ndarray,
    bins: Tuple[int, int],
    range_: Tuple[Tuple[float, float], Tuple[float, float]],
    weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted 2-D histogram, returned already transposed to image layout.

    Returns:
        (H, xedges, yedges) with H of shape (ny_bins, nx_bins) — i.e. the
        ``.T`` the reference applies after jnp.histogram2d
        (diagnostics.py:348-349) is already included.
    """
    (xlo, xhi), (ylo, yhi) = range_
    nx, ny = bins
    ix, vx = _bin_index(x, xlo, xhi, nx)
    iy, vy = _bin_index(y, ylo, yhi, ny)
    valid = vx & vy

    if weights is None:
        w = valid.astype(jnp.float32)
    else:
        w = jnp.where(valid, weights, 0.0)

    H = jnp.zeros((ny, nx), dtype=w.dtype).at[iy, ix].add(
        w, mode="drop", indices_are_sorted=False, unique_indices=False
    )
    xedges = jnp.linspace(xlo, xhi, nx + 1)
    yedges = jnp.linspace(ylo, yhi, ny + 1)
    return H, xedges, yedges


def complex_histogram(
    x: jnp.ndarray,
    y: jnp.ndarray,
    Jx: jnp.ndarray,
    Jy: jnp.ndarray,
    x_edges_n: int,
    y_edges_n: int,
    Lx: float,
    Ly: float,
    convention: str = "legacy",
    return_acc: bool = False,
) -> jnp.ndarray:
    """Coherent detector: per-pixel complex Jones accumulation.

    Mirrors the *binning layout* of the reference's histogram_legacy
    (diagnostics.py:362-369): ``x_edges_n`` points of linspace(-Lx/2, Lx/2)
    act as edges, so there are ``x_edges_n - 1`` pixels per axis, and rays are
    assigned by digitize(...)-1. Values left of the first edge or right of
    the last are dropped.

    Conventions (both return H of shape (y_pixels, x_pixels), float):

    * ``"legacy"`` — sqrt(Re(Σax)^2 + Re(Σay)^2), the amplitude the
      reference computes (diagnostics.py:377). Only the real parts are
      scattered (the reference scatters complex values then discards the
      imaginary parts; here the wasted channels are never scattered).
    * ``"intensity"`` — |Σax|^2 + |Σay|^2, the physically-standard
      detector intensity (time-averaged Poynting flux of the coherent
      pixel sum), which the reference does not offer.

    ``return_acc=True`` returns the raw per-pixel field-sum accumulator
    (ny, nx, C) instead of the finalized image. Accumulators are LINEAR
    in rays, so summing them across ray batches / campaign chunks and
    applying :func:`finalize_complex` once at the end reproduces the
    single-program coherent image EXACTLY — unlike summing finalized
    images, which drops cross-batch interference (the approximation the
    reference's MPI reduce makes, interference_MPI.py:190-204).
    """
    npx = x_edges_n - 1
    npy = y_edges_n - 1
    dx = Lx / npx
    dy = Ly / npy

    ix = jnp.floor((x + Lx / 2.0) / dx).astype(jnp.int32)
    iy = jnp.floor((y + Ly / 2.0) / dy).astype(jnp.int32)
    valid = (
        jnp.isfinite(x) & jnp.isfinite(y)
        & (ix >= 0) & (ix < npx) & (iy >= 0) & (iy < npy)
    )
    ix = jnp.clip(ix, 0, npx - 1)
    iy = jnp.clip(iy, 0, npy - 1)

    # Scatter real/imag as float channels: complex scatter-add is not
    # implemented by the TPU backend, and one fused (N, C) scatter is faster
    # than C separate ones anyway.
    if convention == "legacy":
        chans = jnp.stack([jnp.real(Jx), jnp.real(Jy)], axis=-1)
    elif convention == "intensity":
        chans = jnp.stack(
            [jnp.real(Jx), jnp.imag(Jx), jnp.real(Jy), jnp.imag(Jy)],
            axis=-1)
    else:
        raise ValueError(f"unknown convention {convention!r}; "
                         "expected 'legacy' or 'intensity'")
    chans = jnp.where(valid[:, None], chans, 0.0)
    acc = jnp.zeros((npy, npx, chans.shape[-1]),
                    dtype=chans.dtype).at[iy, ix].add(chans, mode="drop")
    if return_acc:
        return acc
    return finalize_complex(acc, convention)


def finalize_complex(acc: jnp.ndarray, convention: str = "legacy"
                     ) -> jnp.ndarray:
    """Finalize a (ny, nx, C) field-sum accumulator into a detector image.

    The counterpart of ``complex_histogram(..., return_acc=True)``:
    accumulators add exactly across ray batches; call this once on the
    total.
    """
    if convention == "legacy":
        return jnp.sqrt(acc[..., 0] ** 2 + acc[..., 1] ** 2)
    if convention == "intensity":
        return (acc[..., 0] ** 2 + acc[..., 1] ** 2
                + acc[..., 2] ** 2 + acc[..., 3] ** 2)
    raise ValueError(f"unknown convention {convention!r}; "
                     "expected 'legacy' or 'intensity'")


def deposit_cic(
    x: jnp.ndarray,
    y: jnp.ndarray,
    w: jnp.ndarray,
    x_coords: jnp.ndarray,
    y_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Cloud-in-cell (bilinear) deposition of per-ray values onto a grid.

    TPU-native replacement for the reference's scipy LinearNDInterpolator
    scatter of ray amplitude/phase onto the Fresnel grid
    (fresnel_integral.py:72-78): each ray deposits its value onto the four
    surrounding grid nodes with bilinear weights (scatter-add), which is the
    adjoint of bilinear interpolation and fully vectorises.

    Args:
        x, y: (N,) ray positions.
        w: (N,) values to deposit (may be complex).
        x_coords, y_coords: uniform 1-D grid node coordinates.

    Returns:
        (len(x_coords), len(y_coords)) grid of deposited values, normalised
        by the deposited weight density so the result approximates the local
        *average* of ``w`` (like an interpolant, not a density).
    """
    nx, ny = x_coords.shape[0], y_coords.shape[0]
    dx = x_coords[1] - x_coords[0]
    dy = y_coords[1] - y_coords[0]

    tx = (x - x_coords[0]) / dx
    ty = (y - y_coords[0]) / dy
    inside = (
        jnp.isfinite(tx) & jnp.isfinite(ty)
        & (tx >= 0) & (tx <= nx - 1) & (ty >= 0) & (ty <= ny - 1)
    )
    ix = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, nx - 2)
    iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ny - 2)
    fx = jnp.clip(tx - ix, 0.0, 1.0)
    fy = jnp.clip(ty - iy, 0.0, 1.0)

    # Complex values are scattered as separate real/imag float channels
    # (complex scatter-add is unimplemented on the TPU backend).
    is_complex = jnp.iscomplexobj(w)
    if is_complex:
        chans = jnp.stack(
            [jnp.real(w), jnp.imag(w), jnp.ones_like(jnp.real(w))], axis=-1)
    else:
        chans = jnp.stack([w, jnp.ones_like(w)], axis=-1)
    chans = jnp.where(inside[:, None], chans, 0.0)

    acc = jnp.zeros((nx, ny, chans.shape[-1]), dtype=chans.dtype)
    for ddx, wx in ((0, 1.0 - fx), (1, fx)):
        for ddy, wy in ((0, 1.0 - fy), (1, fy)):
            acc = acc.at[ix + ddx, iy + ddy].add(
                chans * (wx * wy)[:, None], mode="drop")
    den = jnp.maximum(acc[..., -1], 1e-12)
    if is_complex:
        return (acc[..., 0] + 1j * acc[..., 1]) / den
    return acc[..., 0] / den
