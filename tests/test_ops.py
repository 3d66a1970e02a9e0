"""Unit tests for core ops: interpolation, histograms, deposition, constants.

Mirrors the reference's validation strategy for interpolators — exactness on
separable analytic fields vs scipy (evaluation/interpolator_testing/
interpolations_benchmarking.py:8-14) — as real pytest assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator as ScipyRGI

from synthpy_tpu import constants
from synthpy_tpu.ops import (
    complex_histogram,
    deposit_cic,
    grid_geometry,
    histogram2d,
    regular_grid_interpolator,
    trilinear,
)


@pytest.fixture(scope="module")
def grid():
    rng = np.random.default_rng(0)
    x = np.linspace(-1.0, 1.0, 17)
    y = np.linspace(-2.0, 2.0, 21)
    z = np.linspace(-0.5, 0.5, 9)
    XX, YY, ZZ = np.meshgrid(x, y, z, indexing="ij")
    vals = np.sin(XX) * np.cos(YY) * np.exp(ZZ)
    pts = rng.uniform(-1.2, 1.2, size=(5000, 3)) * np.array([1.0, 2.0, 0.5])
    # include some clearly out-of-bounds points
    pts[:100] *= 3.0
    return (x, y, z), vals.astype(np.float32), pts.astype(np.float32)


def test_trilinear_matches_scipy(grid):
    (x, y, z), vals, pts = grid
    ref = ScipyRGI((x, y, z), vals, bounds_error=False, fill_value=0.0)(pts)
    got = regular_grid_interpolator(
        (jnp.array(x), jnp.array(y), jnp.array(z)), jnp.array(vals),
        jnp.array(pts))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_trilinear_multichannel(grid):
    (x, y, z), vals, pts = grid
    packed = jnp.stack([jnp.array(vals), 2.0 * jnp.array(vals)], axis=-1)
    origin, inv_sp = grid_geometry([jnp.array(x), jnp.array(y), jnp.array(z)])
    out = trilinear(packed, jnp.array(pts), origin, inv_sp)
    assert out.shape == (pts.shape[0], 2)
    np.testing.assert_allclose(np.asarray(out[:, 1]),
                               2.0 * np.asarray(out[:, 0]), rtol=1e-6)


def test_trilinear_fill_value(grid):
    (x, y, z), vals, pts = grid
    far = jnp.array([[10.0, 10.0, 10.0]], dtype=jnp.float32)
    out = regular_grid_interpolator(
        (jnp.array(x), jnp.array(y), jnp.array(z)), jnp.array(vals), far,
        fill_value=7.5)
    assert float(out[0]) == 7.5


def test_trilinear_exact_at_nodes(grid):
    (x, y, z), vals, _ = grid
    nodes = np.stack(np.meshgrid(x[::4], y[::5], z[::2], indexing="ij"),
                     axis=-1).reshape(-1, 3)
    got = regular_grid_interpolator(
        (jnp.array(x), jnp.array(y), jnp.array(z)), jnp.array(vals),
        jnp.array(nodes, dtype=jnp.float32))
    ref = ScipyRGI((x, y, z), vals)(nodes)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_histogram2d_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 4, 20000)
    y = rng.normal(0, 3, 20000)
    x[::17] = np.nan  # killed rays
    bins = (64, 48)
    rng_ = ((-9.0, 9.0), (-6.75, 6.75))
    H, xe, ye = histogram2d(jnp.array(x), jnp.array(y), bins, rng_)
    mask = ~np.isnan(x) & ~np.isnan(y)
    Href, xer, yer = np.histogram2d(x[mask], y[mask], bins=list(bins),
                                    range=[list(rng_[0]), list(rng_[1])])
    np.testing.assert_allclose(np.asarray(H), Href.T, atol=0)
    np.testing.assert_allclose(np.asarray(xe), xer, rtol=1e-6)


def test_histogram2d_right_edge_inclusive():
    H, _, _ = histogram2d(jnp.array([1.0]), jnp.array([1.0]), (4, 4),
                          ((-1.0, 1.0), (-1.0, 1.0)))
    assert float(H[3, 3]) == 1.0


def test_complex_histogram_accumulates():
    # two rays in the same pixel with opposite phase cancel
    x = jnp.array([0.1, 0.1, 5.0])
    y = jnp.array([0.1, 0.1, 5.0])
    Jx = jnp.array([1.0 + 0j, -1.0 + 0j, 1.0 + 0j])
    Jy = jnp.array([1.0 + 0j, 1.0 + 0j, 0.0 + 0j])
    H = complex_histogram(x, y, Jx, Jy, 19, 15, 18.0, 13.5)
    assert H.shape == (14, 18)
    # pixel containing (0.1, 0.1)
    ix = int((0.1 + 9.0) / 1.0)
    iy = int((0.1 + 6.75) / (13.5 / 14))
    np.testing.assert_allclose(float(H[iy, ix]), 2.0, rtol=1e-6)
    # the (5, 5) ray lands elsewhere with amplitude 1
    assert np.isclose(float(np.asarray(H).sum()), 3.0, rtol=1e-6)


def test_complex_histogram_drops_nan():
    x = jnp.array([jnp.nan]); y = jnp.array([0.0])
    J = jnp.array([1.0 + 0j])
    H = complex_histogram(x, y, J, J, 11, 11, 10.0, 10.0)
    assert float(np.abs(np.asarray(H)).sum()) == 0.0


def test_deposit_cic_reproduces_smooth_field():
    rng = np.random.default_rng(2)
    xc = jnp.linspace(-1, 1, 33)
    yc = jnp.linspace(-1, 1, 33)
    pts = rng.uniform(-1, 1, size=(200000, 2)).astype(np.float32)
    w = np.sin(2 * pts[:, 0]) + np.cos(pts[:, 1])
    grid = deposit_cic(jnp.array(pts[:, 0]), jnp.array(pts[:, 1]),
                       jnp.array(w), xc, yc)
    XX, YY = np.meshgrid(np.asarray(xc), np.asarray(yc), indexing="ij")
    expect = np.sin(2 * XX) + np.cos(YY)
    interior = np.s_[2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(grid)[interior], expect[interior],
                               atol=0.05)


def test_plasma_constants():
    # omega_pe at 1e19 cm^-3 ~ 1.78e14 rad/s
    np.testing.assert_allclose(float(constants.omega_pe(1e19)), 5.64e4 * np.sqrt(1e19))
    omega = constants.omega_from_lwl(1064e-9)
    np.testing.assert_allclose(float(omega), 2 * np.pi * constants.C / 1064e-9)
    # critical density for 1064 nm is ~9.86e26 m^-3 with the reference coeff
    nc = float(constants.critical_density(omega))
    assert 9.7e26 < nc < 1.0e27
    # refractive index below/at critical
    assert float(constants.n_refrac(jnp.array(0.0), omega)) == 1.0
    n_half = float(constants.n_refrac(jnp.array(nc / 2), omega))
    np.testing.assert_allclose(n_half, np.sqrt(0.5), rtol=1e-3)
    assert float(constants.n_refrac(jnp.array(nc * 2), omega)) == 0.0


def test_n_refrac_gradient_finite_through_critical():
    # inverse fits differentiate the phase channel through n_refrac; a
    # plain sqrt(max(x, 0)) NaNs the whole gradient the moment one voxel
    # crosses critical (inf * 0), and sqrt(ne) inside omega_pe does the
    # same at exact vacuum. Both must be true constants on their flat
    # branch (observed: the 128^3 multi-view tomography fit NaN'd in 20
    # Adam steps before the double-where fix).
    omega = float(constants.omega_from_lwl(1064e-9))
    nc = float(constants.critical_density(omega))
    ne = jnp.array([0.0, 1e23, 0.5 * nc, nc, 1.5 * nc, 10 * nc])
    g = jax.grad(lambda n: jnp.sum(constants.n_refrac(n, omega)))(ne)
    assert np.isfinite(np.asarray(g)).all()
    # overdense branch is constant; underdense slope is -1/(2 n nc)
    assert float(g[4]) == 0.0 and float(g[5]) == 0.0
    np.testing.assert_allclose(
        float(g[2]), -1.0 / (2.0 * np.sqrt(0.5) * nc), rtol=2e-3)


def test_kappa_positive_and_scales():
    omega = constants.omega_from_lwl(1064e-9)
    k1 = float(constants.kappa(jnp.array(1e24), jnp.array(100.0),
                               jnp.array(1.0), omega))
    k2 = float(constants.kappa(jnp.array(2e24), jnp.array(100.0),
                               jnp.array(1.0), omega))
    assert k1 > 0
    # kappa ~ ne^2 (up to the slowly varying Coulomb log)
    assert 3.5 < k2 / k1 < 4.5


def test_matmul_dft_matches_native():
    """The MXU matmul-DFT fallback must equal jnp.fft exactly (< f32 eps)."""
    import jax

    from synthpy_tpu.ops import dft

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 12, 8)).astype(np.float32))
    z = x + 1j * jnp.asarray(rng.normal(size=(16, 12, 8)).astype(np.float32))
    try:
        dft.force_matmul(True)
        got_f = np.asarray(dft.fftn(z))
        got_i = np.asarray(dft.ifftn(z))
        got_2 = np.asarray(dft.fft2(z))
    finally:
        dft.force_matmul(False)
    ref_f = np.fft.fftn(np.asarray(z))
    ref_i = np.fft.ifftn(np.asarray(z))
    ref_2 = np.fft.fft2(np.asarray(z))
    scale = np.abs(ref_f).max()
    np.testing.assert_allclose(got_f, ref_f, atol=scale * 1e-5)
    np.testing.assert_allclose(got_i, ref_i, atol=np.abs(ref_i).max() * 1e-4)
    np.testing.assert_allclose(got_2, ref_2, atol=np.abs(ref_2).max() * 1e-5)


def test_grf_matches_with_matmul_dft():
    """GRF synthesis is identical under either FFT implementation."""
    import jax

    from synthpy_tpu.fields import grf
    from synthpy_tpu.ops import dft

    key = jax.random.PRNGKey(3)
    args = dict(k_func=grf.kolmogorov, l_max=2.0, l_min=0.25, extent=1.0,
                res=8)
    _, f_native = grf.grf_domain_fft(key, **args)
    try:
        dft.force_matmul(True)
        _, f_matmul = grf.grf_domain_fft(key, **args)
    finally:
        dft.force_matmul(False)
    np.testing.assert_allclose(np.asarray(f_matmul), np.asarray(f_native),
                               atol=2e-5)


def test_complex_histogram_intensity_convention():
    """intensity = |sum ax|^2 + |sum ay|^2 uses the imaginary channels the
    legacy convention discards (reference diagnostics.py:377 discards
    them too)."""
    x = jnp.array([0.1, 0.1])
    y = jnp.array([0.1, 0.1])
    # two rays, same pixel, +/- 90 deg phases: legacy sees Re = 0,
    # intensity sees |1j - 1j ... | correctly per component
    Jx = jnp.array([1.0j, 1.0j])
    Jy = jnp.array([1.0 + 0j, -1.0 + 0j])
    Hleg = complex_histogram(x, y, Jx, Jy, 19, 15, 18.0, 13.5)
    Hint = complex_histogram(x, y, Jx, Jy, 19, 15, 18.0, 13.5,
                             convention="intensity")
    assert float(np.abs(np.asarray(Hleg)).sum()) == 0.0  # Re parts all zero
    # |2j|^2 + |0|^2 = 4
    np.testing.assert_allclose(float(np.asarray(Hint).sum()), 4.0, rtol=1e-6)

    with pytest.raises(ValueError):
        complex_histogram(x, y, Jx, Jy, 19, 15, 18.0, 13.5,
                          convention="nope")
