"""Tests for ScalarDomain, trace packing, GRF generators, and spectra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants
from synthpy_tpu.fields import ScalarDomain, build_pack, grf, layout_of
from synthpy_tpu.fields.spectrum import fit_spectral_slope, radial_spectrum


def test_domain_coords_and_extent():
    d = ScalarDomain(10e-3, 33)
    assert d.dims == (33, 33, 33)
    np.testing.assert_allclose(float(d.x[0]), -5e-3)
    np.testing.assert_allclose(float(d.x[-1]), 5e-3)
    assert d.extent == pytest.approx(5e-3)
    # non-cubic works without padding hacks
    d2 = ScalarDomain((10e-3, 8e-3, 20e-3), (17, 15, 33),
                      probing_direction="z")
    assert d2.dims == (17, 15, 33)
    assert d2.extent == pytest.approx(10e-3)


def test_domain_explicit_coords_matches_legacy_style():
    ext = 5e-3
    x = np.linspace(-ext, ext, 21)
    d = ScalarDomain(x=x, y=x, z=x)
    assert d.dims == (21, 21, 21)
    assert d.extent == pytest.approx(ext)


def test_analytic_fields_values():
    d = ScalarDomain(10e-3, 21).test_slab(s=1.0, ne_0=2e23)
    ne = np.asarray(d.ne)
    # slab: ne = ne_0 (1 + s x/extent): at x = -extent -> 0, x=+extent -> 2ne0
    np.testing.assert_allclose(ne[0, 0, 0], 0.0, atol=1e17)
    np.testing.assert_allclose(ne[-1, 0, 0], 4e23, rtol=1e-5)

    d.test_lens(ne_0=1e24, LR=1e-3)
    ne = np.asarray(d.ne)
    i0 = 10  # centre index
    np.testing.assert_allclose(ne[i0, i0, 0], 1e24, rtol=1e-5)
    assert ne[0, i0, 0] < 1e24 * np.exp(-20)

    d.test_null()
    assert float(jnp.abs(d.ne).max()) == 0.0


def test_build_pack_gradient_matches_numpy():
    d = ScalarDomain(10e-3, 25).test_slab(s=2.0, ne_0=1e24)
    pack = build_pack(d, lwl=1064e-9)
    assert pack.channels.shape == (25, 25, 25, 3)
    nc = float(constants.critical_density(pack.omega))
    expect = -0.5 * constants.C**2 * np.gradient(
        np.asarray(d.ne) / nc, np.asarray(d.x), axis=0)
    np.testing.assert_allclose(np.asarray(pack.channels[..., 0]), expect,
                               rtol=1e-4)
    # slab has no y/z gradient
    assert float(jnp.abs(pack.channels[..., 1]).max()) == 0.0
    assert float(jnp.abs(pack.channels[..., 2]).max()) == 0.0


def test_build_pack_channel_layout():
    d = ScalarDomain(10e-3, 9).test_slab()
    d.phaseshift = True
    pack = build_pack(d)
    lay = layout_of(d)
    assert lay.n_channels == 4 and lay.phase_index == 3
    assert pack.channels.shape[-1] == 4
    # omega*(n-1) is negative inside plasma
    assert float(pack.channels[..., 3].min()) < 0

    d2 = ScalarDomain(10e-3, 9).test_slab()
    d2.test_B(Bmax=2.0)
    pack2 = build_pack(d2)
    assert pack2.channels.shape[-1] == 6
    lay2 = layout_of(d2)
    assert lay2.faraday_index == 3


def test_grf_domain_fft_properties():
    key = jax.random.PRNGKey(3)
    coords, field = grf.grf_domain_fft(
        key, grf.power_law(11.0 / 3.0), l_max=2e-3, l_min=1e-4,
        extent=1e-3, res=32)
    assert field.shape == (64, 64, 64)
    np.testing.assert_allclose(float(jnp.abs(field).max()), 1.0, rtol=1e-5)
    assert len(coords) == 3 and coords[0].shape == (64,)
    # anisotropic stretch
    coords2, field2 = grf.grf_domain_fft(
        key, grf.kolmogorov, l_max=2e-3, l_min=1e-4, extent=1e-3, res=16,
        factor=2.0)
    assert field2.shape == (32, 32, 64)
    assert coords2[2].shape == (64,)


def test_grf_spectrum_slope_recovery():
    """Generated band-limited GRF must exhibit the imposed power-law slope."""
    key = jax.random.PRNGKey(7)
    p = 11.0 / 3.0
    extent, res = 1e-3, 64
    coords, field = grf.grf_domain_fft(
        key, grf.power_law(p), l_max=extent, l_min=extent / 16,
        extent=extent, res=res)
    k, E, cnt = radial_spectrum(field, 2 * extent, nbins=48, log_bins=True)
    k_lo = 2 * np.pi / extent * 1.5
    k_hi = 2 * np.pi / (extent / 16) * 0.7
    slope = fit_spectral_slope(k, E, cnt, k_lo, k_hi)
    assert slope == pytest.approx(-p, abs=0.45)


def test_grf_fft_zero_mean_and_shape():
    key = jax.random.PRNGKey(11)
    f = grf.grf_fft(key, 16, grf.kolmogorov, ndim=3)
    assert f.shape == (33, 33, 33)
    assert abs(float(f.mean())) < 1e-6 * float(jnp.abs(f).max())


def test_grf_cos_3d_matches_loop_reference():
    """The einsum contraction must equal the direct mode-sum formula."""
    key = jax.random.PRNGKey(5)
    nx = ny = nz = 6
    nmodes = 20
    coords, field = grf.grf_cos_3d(key, grf.kolmogorov, 1.0, 1.0, 1.0,
                                   nx, ny, nz, nmodes, wn1=2 * np.pi)
    # rebuild with explicit numpy loop using identical modes
    from synthpy_tpu.fields.grf import _cos_modes
    wn, A_m, psis, (theta, phi) = _cos_modes(
        key, grf.kolmogorov, 2 * np.pi, np.pi / (1.0 / nx), nmodes, 3)
    wn, A_m = np.asarray(wn), np.asarray(A_m)
    psis = [np.asarray(p) for p in psis]
    theta, phi = np.asarray(theta), np.asarray(phi)
    kx = np.sin(theta) * np.cos(phi) * wn
    ky = np.sin(theta) * np.sin(phi) * wn
    kz = np.cos(theta) * wn
    xc = np.asarray(coords[0]); yc = np.asarray(coords[1]); zc = np.asarray(coords[2])
    ref = np.zeros((nx, ny, nz))
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                a1 = kx * xc[i] + ky * yc[j] + kz * zc[k] + psis[0]
                a2 = kx * xc[i] + ky * yc[j] - kz * zc[k] + psis[1]
                a3 = kx * xc[i] - ky * yc[j] + kz * zc[k] + psis[2]
                a4 = kx * xc[i] - ky * yc[j] - kz * zc[k] + psis[3]
                bm = A_m * np.sqrt(2.0) * (np.cos(a1) + np.cos(a2)
                                           + np.cos(a3) + np.cos(a4))
                ref[i, j, k] = bm.sum()
    np.testing.assert_allclose(np.asarray(field), ref, rtol=1e-4, atol=1e-6)


def test_grf_cos_1d_2d_shapes():
    key = jax.random.PRNGKey(1)
    (xc,), f1 = grf.grf_cos_1d(key, grf.kolmogorov, 1.0, 32, 50, 2 * np.pi)
    assert f1.shape == (32,)
    (xc, yc), f2 = grf.grf_cos_2d(key, grf.kolmogorov, 1.0, 1.0, 16, 24,
                                  50, 2 * np.pi)
    assert f2.shape == (16, 24)


def test_gaussian3d_class_wrapper():
    g = grf.gaussian3D(grf.kolmogorov, seed=0)
    f = g.domain_fft(l_max=2.0, l_min=0.1, extent=1.0, res=8)
    assert f.shape == (16, 16, 16)
    assert g.ne is f


def test_radial_spectrum_1d_2d():
    p = 3.0
    # 1-D shells hold a single mode each: average the spectrum over
    # several realisations before fitting
    E_acc = None
    for seed in range(8):
        (xc,), f1 = grf.grf_domain_fft(jax.random.PRNGKey(seed),
                                       grf.power_law(p), l_max=2.0,
                                       l_min=0.1, extent=1.0, res=256,
                                       ndim=1)
        k, E, cnt = radial_spectrum(f1, 2.0, nbins=32, log_bins=True)
        E_acc = E if E_acc is None else E_acc + E
    slope = fit_spectral_slope(k, E_acc, cnt, 2 * np.pi / 2.0 * 2,
                               2 * np.pi / 0.1 * 0.6)
    assert slope == pytest.approx(-p, abs=0.8)

    coords, f2 = grf.grf_domain_fft(jax.random.PRNGKey(13),
                                    grf.power_law(p), l_max=2.0,
                                    l_min=0.2, extent=1.0, res=64, ndim=2)
    assert f2.shape == (128, 128)
    k2, E2, c2 = radial_spectrum(f2, 2.0, nbins=24, log_bins=True)
    slope2 = fit_spectral_slope(k2, E2, c2, 2 * np.pi / 2.0 * 1.5,
                                2 * np.pi / 0.2 * 0.6)
    assert slope2 == pytest.approx(-p, abs=0.7)


def test_build_pack_bf16():
    d = ScalarDomain(10e-3, 17).test_lens(ne_0=1e24, LR=2e-3)
    p32 = build_pack(d)
    p16 = build_pack(d, dtype=jnp.bfloat16)
    assert p16.channels.dtype == jnp.bfloat16
    a = np.asarray(p16.channels, np.float32)
    b = np.asarray(p32.channels)
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=scale * 8e-3)


def test_solenoidal_vector_field():
    key = jax.random.PRNGKey(21)
    coords, B = grf.grf_vector_solenoidal(
        key, grf.kolmogorov, l_max=2.0, l_min=0.25, extent=1.0, res=16,
        rms=2.5)
    assert B.shape == (32, 32, 32, 3)
    rms = np.sqrt(np.mean(np.sum(np.asarray(B) ** 2, axis=-1)))
    assert rms == pytest.approx(2.5, rel=1e-4)
    # divergence vanishes to spectral accuracy (check via FFT)
    kx = 2 * np.pi * np.fft.fftfreq(32, d=1.0 / 16)
    KX, KY, KZ = np.meshgrid(kx, kx, kx, indexing="ij")
    Bf = [np.fft.fftn(np.asarray(B[..., i])) for i in range(3)]
    div_k = KX * Bf[0] + KY * Bf[1] + KZ * Bf[2]
    power = np.abs(Bf[0]) ** 2 + np.abs(Bf[1]) ** 2 + np.abs(Bf[2]) ** 2
    assert np.abs(div_k).max() < 1e-4 * np.sqrt(power.max()) * np.abs(kx).max()


def test_solenoidal_field_drives_faraday():
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan

    coords, B = grf.grf_vector_solenoidal(
        jax.random.PRNGKey(22), grf.kolmogorov, l_max=2e-3, l_min=5e-4,
        extent=1e-3, res=12, rms=20.0)
    d = ScalarDomain(x=coords[0], y=coords[1], z=coords[2])
    d.external_ne(1e25 * np.ones(d.dims))
    d.external_B(B)
    s0 = init_beam(jax.random.PRNGKey(23), 32, 4e-4, 0.0, d.extent,
                   "circular")
    res = solve_zscan(s0, d)
    pol = np.asarray(res.sf[8])
    assert np.abs(pol).max() > 0  # turbulent Faraday rotation accumulates


def test_plot_midline_gradients_smoke():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = ScalarDomain(10e-3, 15).test_slab()
    _, ax = plt.subplots()
    d.plot_midline_gradients(ax)


def test_build_pack_ne_max_clip():
    """ne_max caps ne/nc before differentiation (minimal_solver parity)."""
    d = ScalarDomain(10e-3, 21).test_lens(ne_0=5e27, LR=2e-3)  # overdense!
    p_raw = build_pack(d)
    p_clip = build_pack(d, ne_max=1.0)
    # clipped pack has bounded gradients; raw pack's exceed them
    g_raw = float(jnp.abs(p_raw.channels[..., 0]).max())
    g_clip = float(jnp.abs(p_clip.channels[..., 0]).max())
    assert g_clip < g_raw
    # inside the clipped plateau the gradient vanishes
    i0 = 10
    assert float(jnp.abs(p_clip.channels[i0, i0, 0, 0])) == 0.0
