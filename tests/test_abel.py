"""Abel transform pair: exact matrix round-trips, analytic Gaussian
projections, and the full synthetic loop — trace a cylindrical plasma
with the z-scan tracer, Abel-invert the exit phase, recover n_e(r)."""

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.analysis.abel import (
    abel_forward,
    abel_invert,
    chord_matrix,
    invert_phase_map,
    phase_to_line_density,
)
from synthpy_tpu.constants import C, critical_density, omega_from_lwl


def test_chord_matrix_geometry():
    L = np.asarray(chord_matrix(4, 1.0))
    assert np.allclose(L, np.triu(L))  # strictly upper triangular
    # sight through the centre-most pixel (y=0.5) inside shell 0
    # (r in [0,1]): chord = 2*sqrt(1-0.25)
    np.testing.assert_allclose(L[0, 0], 2 * np.sqrt(0.75), rtol=1e-6)
    # full chord length through all shells = 2*sqrt(R^2 - y^2)
    np.testing.assert_allclose(L.sum(axis=1),
                               2 * np.sqrt(16.0 - (np.arange(4) + .5) ** 2),
                               rtol=1e-6)


def test_round_trip_exact():
    rng = np.random.default_rng(3)
    f = rng.uniform(0.5, 2.0, (5, 40)).astype(np.float32)
    F = abel_forward(f, dr=0.3)
    back = np.asarray(abel_invert(F, dr=0.3))
    np.testing.assert_allclose(back, f, rtol=2e-4)


def test_gaussian_analytic_projection():
    # Abel transform of exp(-r^2/w^2) is sqrt(pi)*w*exp(-y^2/w^2)
    n, R, w = 400, 4.0, 1.0
    dr = R / n
    r = (np.arange(n) + 0.5) * dr
    f = np.exp(-(r / w) ** 2)
    F = np.asarray(abel_forward(f, dr))
    y = r
    expect = np.sqrt(np.pi) * w * np.exp(-(y / w) ** 2)
    keep = y < 2.5 * w  # tail truncated at R and below f32 noise
    np.testing.assert_allclose(F[keep], expect[keep], rtol=5e-3)
    # and inversion of the ANALYTIC projection recovers the Gaussian
    back = np.asarray(abel_invert(jnp.asarray(expect), dr))
    np.testing.assert_allclose(back[keep], f[keep], atol=5e-3)


def test_tikhonov_regularised_noise():
    n, dr, w = 160, 0.025, 1.0
    r = (np.arange(n) + 0.5) * dr
    f = np.exp(-(r / w) ** 2)
    F = np.asarray(abel_forward(f, dr))
    rng = np.random.default_rng(0)
    noisy = F + rng.normal(0, 0.01, n).astype(np.float32)
    raw = np.asarray(abel_invert(jnp.asarray(noisy), dr))
    reg = np.asarray(abel_invert(jnp.asarray(noisy), dr, reg=0.1))
    err_raw = np.abs(raw - f).max()
    err_reg = np.abs(reg - f).max()
    # onion peeling amplifies axis noise; Tikhonov must beat it clearly
    assert err_reg < 0.5 * err_raw
    np.testing.assert_allclose(reg, f, atol=0.05)


def test_phase_to_line_density_slab():
    # uniform slab: phase = -omega/(2 n_c c) * ne * L to first order
    lwl, ne, Lp = 532e-9, 1e24, 2e-3
    omega = omega_from_lwl(lwl)
    n_c = critical_density(omega)
    phase = -omega / (2 * n_c * C) * ne * Lp
    nl = float(phase_to_line_density(phase, lwl))
    np.testing.assert_allclose(nl, ne * Lp, rtol=1e-6)


def test_traced_cylinder_profile_recovery():
    # the full loop: cylindrical Gaussian n_e column (axis along x,
    # probed along z) -> z-scan trace with phase on -> exit phase of a
    # ray row -> Abel inversion -> radial n_e profile
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext, dim = 4e-3, 81
    ne0, w = 5e23, 1.2e-3  # weak column: deflection negligible, phase not
    d = ScalarDomain(2 * ext, dim)
    Y, Z = jnp.meshgrid(d.y, d.z, indexing="ij")
    prof = ne0 * jnp.exp(-(Y ** 2 + Z ** 2) / w ** 2)
    d.external_ne(jnp.broadcast_to(prof[None], (dim, dim, dim)))
    d.phaseshift = True

    n_ray = 101
    dr = 0.9 * ext / n_ray
    ys = (jnp.arange(n_ray) + 0.5) * dr  # ray row at Abel pixel centres
    s0 = jnp.zeros((9, n_ray))
    s0 = s0.at[1].set(ys).at[2].set(-ext)
    s0 = s0.at[5].set(C).at[6].set(1.0)
    lwl = 532e-9
    res = solve_zscan(s0, d, substeps=4, lwl=lwl)
    phase = np.asarray(res.sf[7])
    F = np.asarray(phase_to_line_density(jnp.asarray(phase), lwl))
    ne_r = np.asarray(abel_invert(jnp.asarray(F), dr))
    r = (np.arange(n_ray) + 0.5) * dr
    expect = ne0 * np.exp(-(r / w) ** 2)
    keep = r < 2 * w
    np.testing.assert_allclose(ne_r[keep], expect[keep],
                               rtol=0.04, atol=0.01 * ne0)


def test_invert_phase_map_rows():
    # symmetric 2-row phase map about the centre column
    n, dr, w, lwl = 64, 5e-5, 1e-3, 532e-9
    y = (np.arange(n) + 0.5) * dr
    omega = omega_from_lwl(lwl)
    n_c = critical_density(omega)
    ne0 = 1e23
    F = np.sqrt(np.pi) * w * ne0 * np.exp(-(y / w) ** 2)
    half_phase = -omega / (2 * n_c * C) * F
    row = np.concatenate([half_phase[::-1], half_phase])
    ne_r = np.asarray(invert_phase_map(np.stack([row, 2 * row]), dr, lwl))
    assert ne_r.shape == (2, n)
    r = y
    keep = r < 2 * w
    np.testing.assert_allclose(ne_r[0][keep], ne0 * np.exp(-(r / w) ** 2)[keep],
                               rtol=0.03, atol=5e20)
    np.testing.assert_allclose(ne_r[1], 2 * ne_r[0], rtol=1e-4)
