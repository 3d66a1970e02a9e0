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
("knife", offset, axis, direction).
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
                 E: jnp.ndarray | None = None):
    """Apply a composed stage list to (4, N) rays (jit-safe).

    Returns rays (and Jones vectors if given; filters NaN both).
    """
    for st in stages:
        kind = st[0]
        if kind == "matrix":
            r = jnp.asarray(st[1], r.dtype) @ r
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
