"""Synthetic X-ray radiography and self-emission imaging.

The reference ships a PROPACEOS opacity-table parser
(src/utils/eos_opacity.py:3-187) but nothing in-tree consumes the tables.
This module closes that loop TPU-natively: the parsed (T, rho) opacity
tables become jittable log-bilinear lookups that drive straight-line
transport integrals through (rho, Te) grids —

- parallel-beam attenuation radiographs (transmission exp(-tau) per
  transverse cell, a pure plane reduction: no rays needed),
- point-projection radiographs (magnified backlighter geometry — the
  X-ray analogue of the proton point-projection in tracer/particles.py,
  sharing its detector convention), and
- grey-body self-emission images (optically-thin emission integrals).

X-rays at backlighter energies (keV) are undeflected by the plasma's
refractive index, so transport is straight-line Beer-Lambert attenuation
rather than the bent-ray ODE of the optical tracer — each image is one
batched trilinear gather + a weighted reduction, an ideal TPU shape
(large dense gathers, no data-dependent control flow).

Units follow the PROPACEOS convention: kappa in cm^2/g, rho in g/cm^3,
Te in eV; grid coordinates stay in meters like the rest of the package
(path lengths are converted to cm inside the integrals).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu.ops.interp import trilinear, grid_geometry

_AXIS_OF = {"x": 0, "y": 1, "z": 2}


def make_opacity_lookup(
    T_grid: jnp.ndarray,
    rho_grid: jnp.ndarray,
    table: jnp.ndarray,
    *,
    log_space: bool = True,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Jittable kappa(Te, rho) lookup over a PROPACEOS-style table.

    PROPACEOS tables (io/eos.read_propaceos; reference
    src/utils/eos_opacity.py:49-187) are (n_T, n_rho) grids sampled
    log-uniformly in both axes, so the lookup is bilinear in
    (log T, log rho) of log(kappa) by default — the standard radiation
    -hydro table convention (positivity-preserving, power laws exact).
    Queries outside the table clamp to the edge (tables are built to
    cover the regime; clamping beats extrapolating a log-fit).

    Args:
        T_grid: (n_T,) temperature grid [eV], ascending.
        rho_grid: (n_rho,) density grid (any units, used consistently).
        table: (n_T, n_rho) opacity values [cm^2/g], strictly positive
            when ``log_space`` (PROPACEOS opacities are).
        log_space: when True (default), interpolate log(table); set False
            to interpolate TABLE VALUES linearly, for tables with zeros/
            negatives (e.g. net emission). Either way the interpolation
            AXES are (log T, log rho), so both grids must be strictly
            positive (PROPACEOS grids are log-uniform by construction).

    Returns:
        ``kappa(Te, rho) -> (N,)`` broadcasting elementwise over inputs.
    """
    T_grid = jnp.asarray(T_grid, dtype=jnp.float32)
    rho_grid = jnp.asarray(rho_grid, dtype=jnp.float32)
    table = jnp.asarray(table, dtype=jnp.float32)
    if table.shape != (T_grid.shape[0], rho_grid.shape[0]):
        raise ValueError(
            f"table shape {table.shape} does not match grids "
            f"({T_grid.shape[0]}, {rho_grid.shape[0]})")
    if float(T_grid[0]) <= 0.0 or float(rho_grid[0]) <= 0.0:
        raise ValueError(
            "T_grid and rho_grid must be strictly positive ascending "
            "(the lookup axes are log-spaced regardless of log_space)")
    lt = jnp.log(T_grid)
    lr = jnp.log(rho_grid)
    vals = jnp.log(table) if log_space else table

    def lookup(Te: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
        Te = jnp.asarray(Te, dtype=jnp.float32)
        rho = jnp.asarray(rho, dtype=jnp.float32)
        # log of clamped-positive queries; the axis clip below bounds the
        # cell, the fraction clip bounds the weight, so zeros are safe.
        qt = jnp.log(jnp.maximum(Te, T_grid[0]))
        qr = jnp.log(jnp.maximum(rho, rho_grid[0]))
        it = jnp.clip(jnp.searchsorted(lt, qt, side="right") - 1,
                      0, lt.shape[0] - 2)
        ir = jnp.clip(jnp.searchsorted(lr, qr, side="right") - 1,
                      0, lr.shape[0] - 2)
        ft = jnp.clip((qt - lt[it]) / (lt[it + 1] - lt[it]), 0.0, 1.0)
        fr = jnp.clip((qr - lr[ir]) / (lr[ir + 1] - lr[ir]), 0.0, 1.0)
        v00 = vals[it, ir]
        v01 = vals[it, ir + 1]
        v10 = vals[it + 1, ir]
        v11 = vals[it + 1, ir + 1]
        out = ((1 - ft) * (1 - fr) * v00 + (1 - ft) * fr * v01
               + ft * (1 - fr) * v10 + ft * fr * v11)
        return jnp.exp(out) if log_space else out

    return lookup


def grey_emissivity(
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Grey-body volume emissivity j(Te, rho) = kappa_e * rho * Te^4.

    Kirchhoff's law with a frequency-integrated Planck source: the
    optically-thin emission per unit length is the (emission) opacity
    times density times B(T) ~ T^4; the sigma/pi constant is left out so
    images are in relative exposure units (the reference's detector
    images are likewise unnormalised counts, diagnostics.py:323-353).
    """
    def j(Te, rho):
        return kappa_fn(Te, rho) * rho * Te ** 4
    return j


def _transverse_axes(probing_direction: str) -> Tuple[int, int, int]:
    p_ax = _AXIS_OF[probing_direction]
    a_ax, b_ax = [a for a in range(3) if a != p_ax]
    return p_ax, a_ax, b_ax


def _plane_integral(
    weight: jnp.ndarray,
    spacing_m: float,
    p_ax: int,
) -> jnp.ndarray:
    """Trapezoid line integral of a (nx,ny,nz) weight field along p_ax,
    in cm (meters -> cm conversion applied here)."""
    w = jnp.moveaxis(weight, p_ax, 0)
    n = w.shape[0]
    trap = jnp.ones((n,), dtype=w.dtype).at[0].set(0.5).at[n - 1].set(0.5)
    return jnp.tensordot(trap, w, axes=(0, 0)) * (spacing_m * 100.0)


def attenuation_image(
    rho: jnp.ndarray,
    Te: jnp.ndarray,
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    spacing_m: float,
    probing_direction: str = "z",
) -> jnp.ndarray:
    """Parallel-beam transmission image exp(-∫ kappa rho ds).

    One pencil beam per transverse grid cell: the optical depth is a
    trapezoid sum over probing-axis planes — a single fused elementwise
    map + reduction, no ray state at all. Returns (na, nb) transmission
    in [0, 1] over the two non-probing axes in x<y<z order (matching the
    optical benches' detector orientation).
    """
    p_ax, _, _ = _transverse_axes(probing_direction)
    tau = _plane_integral(kappa_fn(Te, rho) * rho, spacing_m, p_ax)
    return jnp.exp(-tau)


def self_emission_image(
    rho: jnp.ndarray,
    Te: jnp.ndarray,
    emiss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    spacing_m: float,
    probing_direction: str = "z",
) -> jnp.ndarray:
    """Optically-thin self-emission image ∫ j(Te, rho) ds [per cm path].

    ``emiss_fn(Te, rho)`` is the volume emissivity per unit length —
    use :func:`grey_emissivity` for the grey-body default or pass a
    line-emission model. Same parallel plane-reduction geometry as
    :func:`attenuation_image`.
    """
    p_ax, _, _ = _transverse_axes(probing_direction)
    return _plane_integral(emiss_fn(Te, rho), spacing_m, p_ax)


@partial(jax.jit, static_argnames=(
    "kfn", "bins", "n_steps", "probing_direction"))
def _pp_optical_depth(
    kfn,
    fields: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    origin: jnp.ndarray,
    inv_spacing: jnp.ndarray,
    source_distance: jnp.ndarray,
    detector_distance: jnp.ndarray,
    bins: Tuple[int, int],
    Lx: float,
    Ly: float,
    n_steps: int,
    probing_direction: str,
) -> jnp.ndarray:
    p_ax, a_ax, b_ax = _transverse_axes(probing_direction)
    na, nb = bins
    f32 = jnp.float32
    # pixel centres on the detector plane, in meters
    xa = (jnp.arange(na, dtype=f32) + 0.5) / na * (Lx * 1e-3) - Lx * 5e-4
    xb = (jnp.arange(nb, dtype=f32) + 0.5) / nb * (Ly * 1e-3) - Ly * 5e-4
    # Source and detector ride the box's TRANSVERSE midpoint, not
    # coordinate 0 — grids spanning [0, L] (e.g. FLASH imports) would
    # otherwise be silently mis-framed with chords aimed beside the box.
    ca = 0.5 * (lo[a_ax] + hi[a_ax])
    cb = 0.5 * (lo[b_ax] + hi[b_ax])
    src = (jnp.zeros((3,), f32)
           .at[p_ax].set(lo[p_ax] - source_distance)
           .at[a_ax].set(ca)
           .at[b_ax].set(cb))
    det_p = hi[p_ax] + detector_distance

    A, B = jnp.meshgrid(xa, xb, indexing="ij")
    det = jnp.zeros((na * nb, 3), f32)
    det = det.at[:, a_ax].set(ca + A.ravel())
    det = det.at[:, b_ax].set(cb + B.ravel())
    det = det.at[:, p_ax].set(det_p)

    d = det - src  # (P, 3) chord directions, unnormalised
    # slab-clip each chord against the grid bounding box
    safe = jnp.where(jnp.abs(d) > 0, d, f32(1e-30))
    t1 = (lo - src) / safe
    t2 = (hi - src) / safe
    t_in = jnp.max(jnp.minimum(t1, t2), axis=1)
    t_out = jnp.min(jnp.maximum(t1, t2), axis=1)
    seg = jnp.maximum(t_out - t_in, 0.0)  # 0 when the chord misses

    # n_steps trilinear samples along every chord's in-box segment; rho
    # and Te ride one stacked gather
    s = jnp.linspace(0.0, 1.0, n_steps, dtype=f32)
    t = t_in[:, None] + seg[:, None] * s[None, :]
    pos = src + t[..., None] * d[:, None, :]
    samp = trilinear(fields, pos.reshape(-1, 3), origin, inv_spacing)
    samp = samp.reshape(na * nb, n_steps, 2)
    w = kfn(samp[..., 1], samp[..., 0]) * samp[..., 0]
    trap = jnp.ones((n_steps,), f32).at[0].set(0.5).at[-1].set(0.5)
    path_cm = seg * jnp.linalg.norm(d, axis=1) * 100.0 / (n_steps - 1)
    return ((w * trap[None, :]).sum(axis=1) * path_cm).reshape(na, nb)


def point_projection_radiograph(
    rho: jnp.ndarray,
    Te: jnp.ndarray,
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    coords: Sequence[jnp.ndarray],
    source_distance: float,
    detector_distance: float,
    bins: Tuple[int, int] = (431, 321),
    Lx: float = 18.0,
    Ly: float = 13.5,
    n_steps: int = 96,
    probing_direction: str = "z",
) -> jnp.ndarray:
    """Magnified point-projection transmission radiograph.

    A point X-ray source sits ``source_distance`` [m] before the object
    box on the probing axis; the detector plane sits
    ``detector_distance`` [m] past it, with half-sizes Lx/2 x Ly/2 [mm]
    (KAF-8300 defaults shared with the optical benches, reference
    diagnostics.py:302-311, and the proton point-projection,
    tracer/particles.py). Each of the bins[0] x bins[1] pixels casts one
    chord back to the source; optical depth is a trapezoid sum of
    kappa*rho at ``n_steps`` trilinear samples over the chord's in-box
    segment. Geometric magnification of a feature at the box centre is
    M = (source_distance + L_p + detector_distance) /
    (source_distance + L_p/2).

    ``kappa_fn`` (e.g. from :func:`make_opacity_lookup`) enters the jit
    as a static closure — a new lookup instance retraces, a new table
    passed to the SAME instance does not arise (build one per table).

    Returns (bins[0], bins[1]) transmission exp(-tau) in [0, 1].
    """
    if int(n_steps) < 2:
        raise ValueError(
            f"n_steps must be >= 2 (trapezoid chord sampling), got {n_steps}")
    coords = [jnp.asarray(c, dtype=jnp.float32) for c in coords]
    origin, inv_spacing = grid_geometry(coords)
    lo = jnp.stack([c[0] for c in coords])
    hi = jnp.stack([c[-1] for c in coords])
    fields = jnp.stack([jnp.asarray(rho, jnp.float32),
                        jnp.asarray(Te, jnp.float32)], axis=-1)
    tau = _pp_optical_depth(
        kappa_fn, fields, lo, hi, origin.astype(jnp.float32),
        inv_spacing.astype(jnp.float32),
        jnp.float32(source_distance), jnp.float32(detector_distance),
        tuple(bins), float(Lx), float(Ly), int(n_steps),
        probing_direction)
    return jnp.exp(-tau)


# -- >HBM (1024^3-class) streamed variants ----------------------------------
#
# The (rho, Te) stack is ~8.6 GB f32 at 1024^3 — more than half of HBM
# before any detector buffers. Both transport geometries decompose along
# the probing axis, so the volumes can stay HOST-resident and stream UP
# in plane batches (H2D is the fast tunnel direction — the same regime
# measurement that shaped tracer/zscan.build_segment_pack_upload): each
# batch is one device program that folds its planes into detector-sized
# accumulators, and device peak is one plane batch + the images,
# independent of the volume size.


def radiography_streamed(
    rho,
    Te,
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    spacing_m: float,
    probing_direction: str = "z",
    emiss_fn: Optional[Callable] = None,
    plane_batch: int = 32,
):
    """Parallel-beam attenuation (+ optional self-emission) from host
    volumes, streamed in probing-axis plane batches.

    ``rho``/``Te`` may be numpy arrays of any size (1024^3 included) —
    only ``plane_batch`` planes of each are ever resident on device.
    Returns ``transmission`` (na, nb), or ``(transmission, emission)``
    when ``emiss_fn`` is given (one pass computes both). Matches
    :func:`attenuation_image` / :func:`self_emission_image` to f32
    accumulation order (same trapezoid weights, test-gated).
    """
    import numpy as np

    p_ax, _, _ = _transverse_axes(probing_direction)
    rho_m = np.moveaxis(np.asarray(rho), p_ax, 0)
    Te_m = np.moveaxis(np.asarray(Te), p_ax, 0)
    n_p = rho_m.shape[0]
    want_emiss = emiss_fn is not None

    @partial(jax.jit, donate_argnums=(0, 1),
             static_argnames=("w0", "wlast"))
    def fold(tau, em, rho_b, Te_b, *, w0: bool, wlast: bool):
        w = kappa_fn(Te_b, rho_b) * rho_b
        nb = w.shape[0]
        trap = jnp.ones((nb,), w.dtype)
        if w0:
            trap = trap.at[0].set(0.5)
        if wlast:
            trap = trap.at[nb - 1].set(0.5)
        tau = tau + jnp.tensordot(trap, w, axes=(0, 0))
        if want_emiss:
            em = em + jnp.tensordot(trap, emiss_fn(Te_b, rho_b),
                                    axes=(0, 0))
        return tau, em

    na, nb_t = rho_m.shape[1], rho_m.shape[2]
    tau = jnp.zeros((na, nb_t), jnp.float32)
    em = jnp.zeros((na, nb_t) if want_emiss else (1,), jnp.float32)
    for i0 in range(0, n_p, plane_batch):
        i1 = min(i0 + plane_batch, n_p)
        tau, em = fold(tau, em,
                       jnp.asarray(rho_m[i0:i1], jnp.float32),
                       jnp.asarray(Te_m[i0:i1], jnp.float32),
                       w0=(i0 == 0), wlast=(i1 == n_p))
    scale = spacing_m * 100.0
    trans = jnp.exp(-tau * scale)
    return (trans, em * scale) if want_emiss else trans


def xray_survey_streamed(
    rho,
    Te,
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    coords: Sequence,
    source_distance: float,
    detector_distance: float,
    bins: Tuple[int, int] = (431, 321),
    Lx: float = 18.0,
    Ly: float = 13.5,
    probing_direction: str = "z",
    emiss_fn: Optional[Callable] = None,
    plane_batch: int = 32,
) -> dict:
    """Every streamed X-ray diagnostic in ONE pass over (rho, Te).

    :func:`radiography_streamed` and
    :func:`point_projection_radiograph_streamed` each stream the full
    host stack (8.6 GB f32 at 1024^3) — running both re-uploads it
    (measured 610.7 s total at 1024^3, ROADMAP "X-ray at 1024^3").
    All three integrals decompose by probing-axis plane, so one upload
    can feed every accumulator: each plane batch computes kappa*rho
    once and folds (a) the parallel-beam optical depth, (b) the
    optional self-emission integral, and (c) the point-projection
    per-pixel optical depth, then is discarded.

    Accumulation order matches the single-diagnostic functions exactly
    (same trapezoid weights and fold sequence — parity test-gated at
    small dims), so results are bitwise-identical to running them
    separately at roughly half the wall time.

    Returns ``{"transmission": (na, nb), "point_projection":
    (bins[0], bins[1])}`` plus ``"emission"`` when ``emiss_fn`` is
    given.
    """
    import numpy as np

    p_ax, a_ax, b_ax = _transverse_axes(probing_direction)
    coords = [np.asarray(c, dtype=np.float32) for c in coords]
    na_px, nb_px = bins
    f32 = jnp.float32

    rho_m = np.moveaxis(np.asarray(rho), p_ax, 0)
    Te_m = np.moveaxis(np.asarray(Te), p_ax, 0)
    n_p = rho_m.shape[0]
    want_emiss = emiss_fn is not None

    pa, pb, pp = coords[a_ax], coords[b_ax], coords[p_ax]
    dp = float(pp[1] - pp[0])
    ca = 0.5 * (pa[0] + pa[-1])
    cb = 0.5 * (pb[0] + pb[-1])
    src_p = float(pp[0]) - float(source_distance)
    det_p = float(pp[-1]) + float(detector_distance)
    xa = (np.arange(na_px, dtype=np.float32) + 0.5) / na_px * (Lx * 1e-3) \
        - Lx * 5e-4 + ca
    xb = (np.arange(nb_px, dtype=np.float32) + 0.5) / nb_px * (Ly * 1e-3) \
        - Ly * 5e-4 + cb
    A, B = np.meshgrid(xa, xb, indexing="ij")
    span_p = det_p - src_p
    da = (A.ravel() - ca)
    db = (B.ravel() - cb)
    dl_cm = np.sqrt(da**2 + db**2 + span_p**2) / span_p * dp * 100.0
    inv_sa = 1.0 / float(pa[1] - pa[0])
    inv_sb = 1.0 / float(pb[1] - pb[0])
    da_d = jnp.asarray(da, f32)
    db_d = jnp.asarray(db, f32)

    @partial(jax.jit, donate_argnums=(0, 1, 2),
             static_argnames=("w0", "wlast"))
    def fold(tau_par, em, tau_pp, rho_b, Te_b, fracs, wts, *,
             w0: bool, wlast: bool):
        w = kappa_fn(Te_b, rho_b) * rho_b   # computed ONCE per batch
        nbp, naa, nbb = w.shape
        # (a) parallel-beam: same static-trap tensordot as
        # radiography_streamed.fold (bitwise parity)
        trap = jnp.ones((nbp,), w.dtype)
        if w0:
            trap = trap.at[0].set(0.5)
        if wlast:
            trap = trap.at[nbp - 1].set(0.5)
        tau_par = tau_par + jnp.tensordot(trap, w, axes=(0, 0))
        # (b) self-emission rides the same trapezoid
        if want_emiss:
            em = em + jnp.tensordot(trap, emiss_fn(Te_b, rho_b),
                                    axes=(0, 0))
        # (c) point-projection: plane-crossing bilinear samples of the
        # SAME w planes (point_projection_radiograph_streamed.fold)
        qa = (da_d[None, :] * fracs[:, None] + (ca - pa[0])) * inv_sa
        qb = (db_d[None, :] * fracs[:, None] + (cb - pb[0])) * inv_sb
        inside = ((qa >= 0) & (qa <= naa - 1)
                  & (qb >= 0) & (qb <= nbb - 1))
        ia = jnp.clip(jnp.floor(qa).astype(jnp.int32), 0, naa - 2)
        ib = jnp.clip(jnp.floor(qb).astype(jnp.int32), 0, nbb - 2)
        fa = jnp.clip(qa - ia, 0.0, 1.0)
        fb = jnp.clip(qb - ib, 0.0, 1.0)
        flat = w.reshape(-1)
        base = (jnp.arange(nbp, dtype=jnp.int32)[:, None] * (naa * nbb)
                + ia * nbb + ib)
        v = ((1 - fa) * (1 - fb) * jnp.take(flat, base, mode="clip")
             + (1 - fa) * fb * jnp.take(flat, base + 1, mode="clip")
             + fa * (1 - fb) * jnp.take(flat, base + nbb, mode="clip")
             + fa * fb * jnp.take(flat, base + nbb + 1, mode="clip"))
        v = jnp.where(inside, v, 0.0)
        tau_pp = tau_pp + (wts[:, None] * v).sum(axis=0)
        return tau_par, em, tau_pp

    naa, nbb = rho_m.shape[1], rho_m.shape[2]
    tau_par = jnp.zeros((naa, nbb), f32)
    em = jnp.zeros((naa, nbb) if want_emiss else (1,), f32)
    tau_pp = jnp.zeros((na_px * nb_px,), f32)
    trap_pp = np.ones((n_p,), np.float32)
    trap_pp[0] = trap_pp[-1] = 0.5
    fracs_all = (pp.astype(np.float64) - src_p) / span_p
    for i0 in range(0, n_p, plane_batch):
        i1 = min(i0 + plane_batch, n_p)
        tau_par, em, tau_pp = fold(
            tau_par, em, tau_pp,
            jnp.asarray(rho_m[i0:i1], f32),
            jnp.asarray(Te_m[i0:i1], f32),
            jnp.asarray(fracs_all[i0:i1], f32),
            jnp.asarray(trap_pp[i0:i1]),
            w0=(i0 == 0), wlast=(i1 == n_p))
    scale = dp * 100.0
    out = {"transmission": jnp.exp(-tau_par * scale),
           "point_projection": jnp.exp(
               -tau_pp * jnp.asarray(dl_cm, f32)).reshape(na_px, nb_px)}
    if want_emiss:
        out["emission"] = em * scale
    return out


def point_projection_radiograph_streamed(
    rho,
    Te,
    kappa_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    coords: Sequence,
    source_distance: float,
    detector_distance: float,
    bins: Tuple[int, int] = (431, 321),
    Lx: float = 18.0,
    Ly: float = 13.5,
    probing_direction: str = "z",
    plane_batch: int = 32,
) -> jnp.ndarray:
    """Point-projection transmission radiograph from host volumes.

    Plane-crossing quadrature: every detector chord is monotone along
    the probing axis (source before the box, detector after), so it
    crosses each of the n_p grid planes exactly once, and the optical
    depth is the trapezoid sum of bilinear in-plane samples at those
    crossings with the constant per-chord run length
    ``|d| * dp / d_p``. That makes the integral decompose EXACTLY by
    plane — each uploaded batch folds its planes' samples into the
    per-pixel tau accumulator and is then discarded. Quadrature differs
    from :func:`point_projection_radiograph`'s fixed ``n_steps``
    chord sampling (here: one sample per grid plane — the resolution-
    matched choice), so images agree to quadrature tolerance, not
    bitwise (test-gated at small dims).

    Transverse exits are handled by the bilinear fill: samples outside
    the box contribute zero, exactly like the dense version's chord
    clipping in the limit of matched quadrature.
    """
    import numpy as np

    p_ax, a_ax, b_ax = _transverse_axes(probing_direction)
    coords = [np.asarray(c, dtype=np.float32) for c in coords]
    na_px, nb_px = bins
    f32 = jnp.float32

    rho_m = np.moveaxis(np.asarray(rho), p_ax, 0)
    Te_m = np.moveaxis(np.asarray(Te), p_ax, 0)
    n_p = rho_m.shape[0]
    # in-plane geometry: after moveaxis the plane axes are (a_ax, b_ax)
    # in their original relative order, which _transverse_axes preserves
    pa = coords[a_ax]
    pb = coords[b_ax]
    pp = coords[p_ax]
    dp = float(pp[1] - pp[0])

    ca = 0.5 * (pa[0] + pa[-1])
    cb = 0.5 * (pb[0] + pb[-1])
    src_p = float(pp[0]) - float(source_distance)
    det_p = float(pp[-1]) + float(detector_distance)

    xa = (np.arange(na_px, dtype=np.float32) + 0.5) / na_px * (Lx * 1e-3) \
        - Lx * 5e-4 + ca
    xb = (np.arange(nb_px, dtype=np.float32) + 0.5) / nb_px * (Ly * 1e-3) \
        - Ly * 5e-4 + cb
    A, B = np.meshgrid(xa, xb, indexing="ij")
    # chord from source (ca, cb, src_p) to detector pixel (A, B, det_p):
    # at plane p the transverse position interpolates linearly in p
    span_p = det_p - src_p
    da = (A.ravel() - ca)
    db = (B.ravel() - cb)
    # per-chord run length between consecutive plane crossings
    dl_cm = np.sqrt(da**2 + db**2 + span_p**2) / span_p * dp * 100.0

    inv_sa = 1.0 / float(pa[1] - pa[0])
    inv_sb = 1.0 / float(pb[1] - pb[0])

    da_d = jnp.asarray(da, f32)
    db_d = jnp.asarray(db, f32)

    @partial(jax.jit, donate_argnums=(0,))
    def fold(tau, rho_b, Te_b, fracs, wts):
        # one vectorised bilinear gather over (planes-in-batch, pixels):
        # plane j's samples index into the batch's stacked weight planes
        w = kappa_fn(Te_b, rho_b) * rho_b  # (nbp, naa, nbb)
        nbp, naa, nbb = w.shape
        qa = (da_d[None, :] * fracs[:, None] + (ca - pa[0])) * inv_sa
        qb = (db_d[None, :] * fracs[:, None] + (cb - pb[0])) * inv_sb
        inside = ((qa >= 0) & (qa <= naa - 1)
                  & (qb >= 0) & (qb <= nbb - 1))
        ia = jnp.clip(jnp.floor(qa).astype(jnp.int32), 0, naa - 2)
        ib = jnp.clip(jnp.floor(qb).astype(jnp.int32), 0, nbb - 2)
        fa = jnp.clip(qa - ia, 0.0, 1.0)
        fb = jnp.clip(qb - ib, 0.0, 1.0)
        flat = w.reshape(-1)
        base = (jnp.arange(nbp, dtype=jnp.int32)[:, None] * (naa * nbb)
                + ia * nbb + ib)
        v = ((1 - fa) * (1 - fb) * jnp.take(flat, base, mode="clip")
             + (1 - fa) * fb * jnp.take(flat, base + 1, mode="clip")
             + fa * (1 - fb) * jnp.take(flat, base + nbb, mode="clip")
             + fa * fb * jnp.take(flat, base + nbb + 1, mode="clip"))
        v = jnp.where(inside, v, 0.0)
        return tau + (wts[:, None] * v).sum(axis=0)

    trap = np.ones((n_p,), np.float32)
    trap[0] = trap[-1] = 0.5
    fracs_all = (pp.astype(np.float64) - src_p) / span_p
    tau = jnp.zeros((na_px * nb_px,), f32)
    for i0 in range(0, n_p, plane_batch):
        i1 = min(i0 + plane_batch, n_p)
        tau = fold(tau, jnp.asarray(rho_m[i0:i1], f32),
                   jnp.asarray(Te_m[i0:i1], f32),
                   jnp.asarray(fracs_all[i0:i1], f32),
                   jnp.asarray(trap[i0:i1]))
    tau = tau * jnp.asarray(dl_cm, f32)
    return jnp.exp(-tau).reshape(na_px, nb_px)
