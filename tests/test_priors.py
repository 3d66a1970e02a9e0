"""Priors for inverse problems: TV, Haar sparsity, GRF-spectrum whitener."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu.fields.spectrum import fit_spectral_slope, radial_spectrum
from synthpy_tpu.priors import (haar2d, haar_l1, ihaar2d, make_grf_whitener,
                                tv, white_l2)


def test_tv_matches_inline_definition():
    g = jax.random.normal(jax.random.PRNGKey(0), (17, 23))
    inline = (jnp.mean(jnp.abs(jnp.diff(g, axis=0)))
              + jnp.mean(jnp.abs(jnp.diff(g, axis=1))))
    assert np.allclose(float(tv(g)), float(inline), rtol=1e-6)
    assert float(tv(jnp.ones((8, 8, 8)))) == 0.0


def test_haar_round_trip_and_parseval():
    g = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    a, details = haar2d(g, levels=3)
    rec = ihaar2d(a, details)
    assert np.allclose(np.asarray(rec), np.asarray(g), atol=1e-5)
    # orthonormal: energy preserved across the transform
    e_coeff = float((a**2).sum()
                    + sum((x**2).sum() for tri in details for x in tri))
    assert np.allclose(e_coeff, float((g**2).sum()), rtol=1e-5)


def test_haar_round_trip_3d_slicewise():
    g = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 5))
    a, details = haar2d(g, levels=2)
    assert np.allclose(np.asarray(ihaar2d(a, details)), np.asarray(g),
                       atol=1e-5)


def test_haar_l1_taxes_speckle_not_smooth():
    x = jnp.linspace(-1, 1, 64)
    smooth = jnp.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / 0.2)
    noisy = smooth + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (64, 64))
    assert float(haar_l1(noisy)) > 2.0 * float(haar_l1(smooth))
    with pytest.raises(ValueError):
        haar2d(jnp.zeros((12, 12)), levels=3)  # 12 % 8 != 0


def test_grf_whitener_unit_variance_and_slope():
    n, L = 128, 1.0
    colorize, n_active = make_grf_whitener((n, n), L / n,
                                           lambda k: k ** (-3.0))
    assert n_active > 0
    theta = jax.random.normal(jax.random.PRNGKey(4), (n, n))
    g = colorize(theta)
    assert g.shape == (n, n)
    # unit variance by construction (single realisation: loose tolerance)
    assert 0.5 < float(g.var()) < 2.0
    k, E, c = radial_spectrum(g, L)
    k_fund = 2 * np.pi / L
    slope = fit_spectral_slope(k, E, c, 4 * k_fund, 20 * k_fund)
    assert -3.8 < slope < -2.2, slope


def test_grf_whitener_band_limit_and_map_gradient():
    n, L = 64, 1.0
    dx = L / n
    colorize, _ = make_grf_whitener((n, n), dx, lambda k: k ** (-2.0),
                                    l_max=L / 2, l_min=L / 8)
    theta = jax.random.normal(jax.random.PRNGKey(5), (n, n))
    g = colorize(theta)
    k, E, c = radial_spectrum(g, L)
    # power confined to the [2pi/l_max, 2pi/l_min] band
    kin = (k >= 2 * np.pi / (L / 2)) & (k <= 2 * np.pi / (L / 8))
    occupied = np.asarray(c) > 0
    in_band = float(np.asarray(E)[kin & occupied].sum())
    out_band = float(np.asarray(E)[~kin & occupied].sum())
    assert in_band > 100.0 * max(out_band, 1e-30)

    # MAP objective differentiates end-to-end and the white-space prior
    # gradient is exactly theta / theta.size
    target = colorize(jax.random.normal(jax.random.PRNGKey(6), (n, n)))

    def loss(th):
        return jnp.mean((colorize(th) - target) ** 2) + white_l2(th)

    grads = jax.grad(loss)(theta)
    assert bool(jnp.isfinite(grads).all())
    gp = jax.grad(white_l2)(theta)
    assert np.allclose(np.asarray(gp), np.asarray(theta) / theta.size,
                       rtol=1e-6)

    with pytest.raises(ValueError):
        make_grf_whitener((n, n), dx, lambda k: k ** (-2.0),
                          l_max=L / 1000, l_min=L / 2000)  # empty band
