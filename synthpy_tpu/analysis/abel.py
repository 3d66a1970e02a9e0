"""Abel transform pair: axisymmetric density profiles from phase maps.

Closes the analysis loop the reference leaves open: its notebooks go
interferogram -> fringe phase (our analysis/fringes.py implements that
step, Takeda FFT demodulation) but stop at the projected phase map. For
the cylindrically symmetric plasmas pulsed-power experiments produce
(z-pinch columns, liners), the standard final step is an inverse Abel
transform of each axial row: projected line density F(y) -> radial
profile f(r) with F(y) = 2 * integral_y^R f(r) r dr / sqrt(r^2 - y^2).

Implementation is the onion-peeling matrix method, TPU-shaped: the
transform is ONE upper-triangular (n, n) matrix of chord lengths shared
by every axial row, so a full 2-D map inverts as a single triangular
solve with a batched right-hand side (MXU-friendly), optionally
Tikhonov-regularised for noisy experimental maps. Chord geometry is
exact for shell-wise-constant profiles, so matrix round-trips are exact
to solver precision and smooth profiles converge at O(dr^2).

``phase_to_line_density`` converts tracer/fringe phase to integrated
electron line density using the same linearised-refractive-index
convention the tracer accumulates (phase' = omega (n - 1) / c per unit
path, n - 1 ~= -ne / (2 n_c); tracer/zscan.py phase channel, reference
propagator.py:151-156).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from synthpy_tpu.constants import C, critical_density, omega_from_lwl


@partial(jax.jit, static_argnames=("n",))
def chord_matrix(n: int, dr: float = 1.0) -> jnp.ndarray:
    """(n, n) upper-triangular onion-peeling chord-length matrix.

    Shell j spans radii [j*dr, (j+1)*dr); the line of sight i passes at
    impact parameter y_i = (i + 1/2)*dr (pixel centres). Entry (i, j) is
    the chord length of sight i inside shell j:
    ``2*(sqrt(r_{j+1}^2 - y_i^2) - sqrt(max(r_j, y_i)^2 - y_i^2))``.
    F = L @ f maps shell values to projections exactly for
    shell-wise-constant f.
    """
    j = jnp.arange(n + 1, dtype=jnp.float32) * dr  # shell edges
    y = (jnp.arange(n, dtype=jnp.float32) + 0.5) * dr
    y2 = y[:, None] ** 2
    outer = jnp.sqrt(jnp.maximum(j[None, 1:] ** 2 - y2, 0.0))
    inner = jnp.sqrt(jnp.maximum(j[None, :-1] ** 2 - y2, 0.0))
    return 2.0 * (outer - inner)


def abel_forward(f: jnp.ndarray, dr: float) -> jnp.ndarray:
    """Project radial profile(s) f(r) to line integrals F(y).

    ``f``: (..., n) shell values sampled at r = (i + 1/2)*dr. Returns
    the same shape at impact parameters y = (i + 1/2)*dr.
    """
    f = jnp.asarray(f, dtype=jnp.float32)
    L = chord_matrix(f.shape[-1], float(dr))
    return f @ L.T


def abel_invert(
    F: jnp.ndarray,
    dr: float,
    reg: float = 0.0,
) -> jnp.ndarray:
    """Inverse Abel transform of projection(s) F(y).

    ``F``: (..., n) line integrals at y = (i + 1/2)*dr — e.g. one half
    of a symmetrised phase-map row per batch element. With ``reg == 0``
    this is the exact back-substitution inverse of :func:`abel_forward`
    (onion peeling). Onion peeling amplifies pixel noise near the axis;
    ``reg > 0`` switches to Tikhonov with a second-difference penalty,
    solving (L^T L + reg * s * D^T D) f = L^T F where s = tr(L^T L)/n
    makes ``reg`` dimensionless — ~1e-3..1e-1 for experimental maps.
    """
    F = jnp.asarray(F, dtype=jnp.float32)
    n = F.shape[-1]
    L = chord_matrix(n, float(dr))
    if reg == 0.0:
        # solve_triangular batches over trailing rhs columns
        sol = solve_triangular(L, F.reshape(-1, n).T, lower=False)
        return sol.T.reshape(F.shape)
    # second differences: mirror (Neumann) row at the axis — r=0 has
    # f'(0)=0 for any smooth axisymmetric profile — interior rows
    # elsewhere, free outer boundary (no spurious shrink of the edges)
    D = (jnp.eye(n, dtype=jnp.float32) * -2.0
         + jnp.eye(n, k=1, dtype=jnp.float32)
         + jnp.eye(n, k=-1, dtype=jnp.float32))
    D = D.at[0].set(jnp.zeros(n).at[0].set(-2.0).at[1].set(2.0))
    D = D.at[n - 1].set(0.0)
    G = L.T @ L
    scale = jnp.trace(G) / n
    A = G + jnp.float32(reg) * scale * (D.T @ D)
    sol = jnp.linalg.solve(A, L.T @ F.reshape(-1, n).T)
    return sol.T.reshape(F.shape)


def phase_to_line_density(phase: jnp.ndarray, lwl: float) -> jnp.ndarray:
    """Integrated line density ∫ n_e dl [m^-2] from accumulated phase.

    Inverts the tracer's linearised phase accumulation
    phase = -omega / (2 n_c c) * ∫ n_e dl (exact to first order in
    n_e/n_c — the regime where interferometry is linear anyway):
    ∫ n_e dl = -2 n_c c phase / omega. A plasma DELAYS the wave
    (n < 1), so physical plasma phase is negative and the returned line
    density positive.
    """
    omega = omega_from_lwl(lwl)
    n_c = critical_density(omega)
    return -2.0 * n_c * C * jnp.asarray(phase) / omega


def invert_phase_map(
    phase_map: jnp.ndarray,
    dr: float,
    lwl: float,
    axis_index: int | None = None,
    reg: float = 0.0,
) -> jnp.ndarray:
    """Phase map (rows ⊥ symmetry axis) -> radial n_e(r) per row [m^-3].

    Each row of ``phase_map`` (shape (n_rows, n_y), y the transverse
    pixel coordinate with spacing ``dr`` [m]) is split about the
    symmetry axis (``axis_index`` defaults to the centre; the two half
    profiles are averaged — the standard symmetrisation), converted to
    line density, and Abel-inverted. Returns (n_rows, n) radial
    profiles at r = (i + 1/2) * dr.

    Sign: expects the PHYSICAL phase convention (plasma delays the
    probe, so in-plasma phase < 0 -> positive density). Takeda
    extraction (analysis.fringes) has a global sign ambiguity — the two
    sidebands are conjugates — so flip the map first if its in-plasma
    values come out positive (see examples/interferogram_to_density.py).
    """
    phase_map = jnp.asarray(phase_map, dtype=jnp.float32)
    n_y = phase_map.shape[-1]
    c = n_y // 2 if axis_index is None else int(axis_index)
    right = phase_map[:, c:]
    left = phase_map[:, :c][:, ::-1]
    n = min(left.shape[-1], right.shape[-1])
    sym = 0.5 * (left[:, :n] + right[:, :n])
    F = phase_to_line_density(sym, lwl)
    return abel_invert(F, dr, reg=reg)
