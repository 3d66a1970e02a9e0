"""Precomposed optical trains: one matrix per aperture-free segment.

The reference ships a variant where optical trains are composed
symbolically with sympy and lambdified before applying them to rays
(src/solvers-legacy/rtm_solver-louis.py:185-271, X1 = f1*d1*X0 etc.).
The TPU-native equivalent: fold each run of lens/travel elements into a
single 4x4 ABCD matrix at trace time (plain matmuls of 4x4 constants —
free at compile time), leaving only the filters (apertures/stops/knife
edges) as separate masking stages. A full bench then becomes
``matmul -> mask -> matmul -> ...`` with the minimum possible work per ray.

Elements are declared as ("lens", f1, f2) / ("travel", d) /
("aperture", R) / ("stop", R) / ("rect", Lx, Ly) /
("knife", offset, axis, direction), plus two coherent bookkeeping
stages: ("phase",) advances the Jones phase by k*|transverse path| since
the last checkpoint plane (the per-element propagate_E of the reference,
diagnostics.py:505-524 — exactly equal because lenses and apertures do
not move ray positions, so only travel segments contribute), and
("mark",) resets the checkpoint without adding phase (for benches that
skip the first travel's phase, like the coherent refractometer).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from synthpy_tpu.optics import rtm

MATRIX_ELEMENTS = ("lens", "sym_lens", "travel")


def element_matrix(element: Tuple) -> np.ndarray:
    """4x4 ABCD matrix of a non-filtering element (host-side, numpy)."""
    kind = element[0]
    M = np.eye(4)
    if kind == "travel":
        d = element[1]
        M[0, 1] = d
        M[2, 3] = d
    elif kind == "lens":
        f1, f2 = element[1], element[2]
        M[1, 0] = -1.0 / f1
        M[3, 2] = -1.0 / f2
    elif kind == "sym_lens":
        f = element[1]
        M[1, 0] = -1.0 / f
        M[3, 2] = -1.0 / f
    else:
        raise ValueError(f"{kind!r} is not a matrix element")
    return M


def compose(elements: Sequence[Tuple]) -> List[Tuple]:
    """Fold consecutive matrix elements into single ("matrix", M) stages.

    Returns a reduced stage list of ("matrix", 4x4) and filter tuples, in
    application order.
    """
    stages: List[Tuple] = []
    acc: np.ndarray | None = None
    for el in elements:
        if el[0] in MATRIX_ELEMENTS:
            M = element_matrix(el)
            acc = M if acc is None else M @ acc
        else:
            if acc is not None:
                stages.append(("matrix", acc))
                acc = None
            stages.append(el)
    if acc is not None:
        stages.append(("matrix", acc))
    return stages


def apply_stages(r: jnp.ndarray, stages: Sequence[Tuple],
                 E: jnp.ndarray | None = None,
                 wavelength: float | None = None):
    """Apply a composed stage list to (4, N) rays [mm] (jit-safe).

    Returns rays (and Jones vectors if given; filters NaN both).
    ``wavelength`` [m] is required when the stage list contains
    ("phase",) checkpoints.
    """
    r_mark = r
    for st in stages:
        kind = st[0]
        if kind == "matrix":
            r = jnp.asarray(st[1], r.dtype) @ r
        elif kind == "mark":
            r_mark = r
        elif kind == "phase":
            k = 2.0 * jnp.pi / wavelength
            dx = (r[0, :] - r_mark[0, :]) * 1e-3  # mm -> m
            dy = (r[2, :] - r_mark[2, :]) * 1e-3
            # safe norm (double-where): keeps jax.grad through the bench
            # finite for rays with exactly zero transverse path
            d2 = dx**2 + dy**2
            path = jnp.where(d2 > 0,
                             jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
            E = E * jnp.exp(1.0j * k * path)
            r_mark = r
        elif kind == "aperture":
            if E is not None:
                r, E = rtm.circular_aperture(r, st[1], E=E)
            else:
                r = rtm.circular_aperture(r, st[1])
        elif kind == "stop":
            r = rtm.circular_stop(r, st[1])
        elif kind == "rect":
            r = rtm.rect_aperture(r, st[1], st[2])
        elif kind == "knife":
            r = rtm.knife_edge(r, st[1], st[2], st[3])
        else:
            raise ValueError(f"unknown stage {kind!r}")
    if E is not None:
        return r, E
    return r


def interfere_ref_beam(r_mm: jnp.ndarray, Jf: jnp.ndarray,
                       n_fringes: float, deg: float) -> jnp.ndarray:
    """Add the tilted plane-wave reference to the y polarisation
    (free-function twin of Interferometry.interfere_ref_beam; reference
    diagnostics.py:559-581 with its deg >= 45 flip)."""
    if deg >= 45:
        deg = -abs(deg - 90)
    rad = deg * jnp.pi / 180.0
    ref = jnp.exp(2 * n_fringes / 3 * 1.0j
                  * (jnp.cos(rad) * r_mm[0, :] + jnp.sin(rad) * r_mm[2, :]))
    return Jf.at[1, :].add(ref)


# -- declarative descriptions of the standard benches -----------------------
# (geometry identical to optics.diagnostics; reference diagnostics.py:381-458)

def shadowgraphy_two_lens(L: float = 400, R: float = 25,
                          focal_plane: float = 0) -> List[Tuple]:
    return compose([
        ("travel", L - focal_plane), ("aperture", R), ("sym_lens", L / 2),
        ("travel", 2 * L), ("aperture", R), ("sym_lens", L / 2),
        ("travel", L),
    ])


def shadowgraphy_single_lens(L: float = 400, R: float = 25,
                             focal_plane: float = 0) -> List[Tuple]:
    return compose([
        ("travel", 3 * L / 4 - focal_plane), ("aperture", R),
        ("sym_lens", L / 2), ("travel", 3 * L / 2),
    ])


def schlieren_df(L: float = 400, R: float = 25, stop_R: float = 1,
                 focal_plane: float = 0) -> List[Tuple]:
    return compose([
        ("travel", L - focal_plane), ("aperture", R), ("sym_lens", L),
        ("travel", L), ("stop", stop_R), ("travel", L), ("aperture", R),
        ("sym_lens", L), ("travel", L),
    ])


def refractometer(L: float = 400, R: float = 25,
                  focal_plane: float = 0) -> List[Tuple]:
    return compose([
        ("travel", 3 * L / 4 - focal_plane), ("aperture", R),
        ("sym_lens", L / 2), ("travel", 3 * L / 2), ("rect", 15, 30),
        ("aperture", R), ("lens", L / 3, L / 2), ("travel", L),
    ])


def shadowgraphy_single_exp(L: float = 400, R: float = 25,
                            detL: float = 400,
                            focal_plane: float = 0) -> List[Tuple]:
    """Single lens with variable detector arm (legacy
    rtm_solver.py:216-222; object plane fixed at L, focal_plane unused —
    kept in the signature for BENCHES uniformity)."""
    return compose([
        ("travel", L), ("aperture", R), ("sym_lens", L / 2),
        ("travel", detL),
    ])


def schlieren_lf(L: float = 400, R: float = 25, aperture_R: float = 1,
                 focal_plane: float = 0) -> List[Tuple]:
    """Light-field schlieren: aperture at the focal plane passes only
    undeflected rays (diagnostics.py:444-458)."""
    return compose([
        ("travel", L - focal_plane), ("aperture", R), ("sym_lens", L),
        ("travel", L), ("aperture", aperture_R), ("travel", L),
        ("aperture", R), ("sym_lens", L), ("travel", L),
    ])


def interferometry_two_lens(L: float = 400, R: float = 25,
                            focal_plane: float = 0) -> List[Tuple]:
    """M = 1 telescope with per-travel Jones phase advance (the
    rtm_solver-louis InterferometryOptics train, composed numerically;
    equals Interferometry.two_lens_solve because lenses and apertures do
    not displace rays, so each ("phase",) sees exactly that travel's
    transverse path)."""
    return compose([
        ("travel", L - focal_plane), ("phase",),
        ("aperture", R),
        ("sym_lens", L / 2), ("travel", 2 * L), ("phase",),
        ("aperture", R),
        ("sym_lens", L / 2), ("travel", L), ("phase",),
    ])


def polarimetry_two_lens(L: float = 400, R: float = 25,
                         focal_plane: float = 0) -> List[Tuple]:
    """M = 1 imaging telescope for Faraday-rotation polarimetry — the
    geometry of :func:`shadowgraphy_two_lens`. The analyser is not a
    ray-transfer element: it becomes a per-ray detector WEIGHT
    |amp * cos(pol + beta)|^2 applied at binning time (pipeline
    `pol_beta_deg` / Polarimetry.polarogram), since polarisation rides
    the Jones vector, untouched by lenses and apertures."""
    return shadowgraphy_two_lens(L=L, R=R, focal_plane=focal_plane)


# Benches that are INCOHERENT (linear in rays, so batch sums are exact)
# but still read the Jones vectors for per-ray detector weights.
NEEDS_JONES = frozenset({"polarimetry"})


def analyser_weight(Jf: jnp.ndarray, beta_deg, dtype=None) -> jnp.ndarray:
    """Per-ray intensity transmitted by a linear analyser at ``beta_deg``.

    I = |Jx sin(beta) + Jy cos(beta)|^2 = amp^2 cos^2(pol + beta) for the
    tracer's R(pol) @ y-hat polarisation (propagator.ray_to_Jonesvector).
    Written as re^2 + im^2 rather than abs()**2: smooth everywhere — no
    |.| kink at the extinction null to poison jax.grad. The ONE place the
    analyser convention lives (forward pipeline, differentiable renderer
    and the Polarimetry class all call this).
    """
    beta = jnp.deg2rad(jnp.asarray(beta_deg, dtype))
    t = Jf[0, :] * jnp.sin(beta) + Jf[1, :] * jnp.cos(beta)
    return t.real**2 + t.imag**2


def refractometer_coherent(L: float = 400, R: float = 25,
                           focal_plane: float = 0) -> List[Tuple]:
    """Coherent imaging refractometer (diagnostics.py:505-524): no phase
    over the first travel (the reference starts propagating after the
    first aperture), then per-travel phase advance."""
    return compose([
        ("travel", 3 * L / 4 - focal_plane), ("mark",),
        ("aperture", R),
        ("sym_lens", L / 2), ("travel", 3 * L / 2), ("phase",),
        ("aperture", R),
        ("lens", L / 3, L / 2), ("travel", L), ("phase",),
    ])


# composed stage lists for every bench the fused pipeline offers,
# keyed like pipeline.DIAGNOSTICS: name -> (builder, coherent)
BENCHES = {
    "shadowgraphy": (shadowgraphy_two_lens, False),
    "shadowgraphy_single": (shadowgraphy_single_lens, False),
    "shadowgraphy_exp": (shadowgraphy_single_exp, False),
    "schlieren_df": (schlieren_df, False),
    "schlieren_lf": (schlieren_lf, False),
    "refractometry": (refractometer, False),
    "refractometry_coherent": (refractometer_coherent, True),
    "interferometry": (interferometry_two_lens, True),
    "polarimetry": (polarimetry_two_lens, False),
}
