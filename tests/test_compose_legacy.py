"""Composed optical trains + legacy-style ScalarDomain API."""

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.optics import Shadowgraphy, Schlieren, compose
from synthpy_tpu.tracer import init_beam

EXT = 5e-3


def test_composed_shadowgraphy_matches_elementwise():
    rng = np.random.default_rng(0)
    rf_m = np.zeros((4, 500))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, 500)
    rf_m[1] = rng.uniform(-1e-3, 1e-3, 500)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, 500)
    sh = Shadowgraphy(532e-9, jnp.asarray(rf_m))
    ref = np.asarray(sh.two_lens_solve())

    stages = compose.shadowgraphy_two_lens()
    # stages collapse to matrix/aperture/matrix/aperture/matrix
    kinds = [s[0] for s in stages]
    assert kinds == ["matrix", "aperture", "matrix", "aperture", "matrix"]
    out = np.asarray(compose.apply_stages(sh.r0, stages))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_composed_schlieren_matches_elementwise():
    rng = np.random.default_rng(1)
    rf_m = np.zeros((4, 300))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, 300)
    rf_m[1] = rng.uniform(-4e-3, 4e-3, 300)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, 300)
    sc = Schlieren(532e-9, jnp.asarray(rf_m))
    ref = np.asarray(sc.DF_solve(R=1))
    out = np.asarray(compose.apply_stages(
        sc.r0, compose.schlieren_df(stop_R=1)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_composed_jones_filtering():
    r = jnp.array([[0.0, 30.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    E = jnp.ones((2, 2), jnp.complex64)
    stages = compose.compose([("travel", 1.0), ("aperture", 25.0)])
    r2, E2 = compose.apply_stages(r, stages, E=E)
    assert np.isnan(np.asarray(r2)[:, 1]).all()
    assert np.isnan(np.asarray(E2)[:, 1].real).all()


def test_legacy_domain_api_roundtrip():
    d = ScalarDomain(2 * EXT, 21).test_lens(ne_0=5e24, LR=1.5e-3)
    d.calc_dndr(lwl=1064e-9)
    s0 = init_beam(jax.random.PRNGKey(0), 64, 1.5e-3, 0.0, EXT, "circular")
    rf = d.solve(s0)
    assert rf.shape == (4, 64)
    assert np.abs(np.asarray(rf[1])).max() > 0  # lens deflects
    rf2, Jf = d.solve_with_E(s0)
    assert Jf.shape == (2, 64)
    # legacy time-solver path too
    rf3 = d.solve(s0, solver="time", n_steps=32)
    np.testing.assert_allclose(np.asarray(rf3[1]), np.asarray(rf[1]),
                               rtol=5e-2, atol=1e-6)
    d.clear_memory()
    assert d.rf is None


def test_legacy_solve_at_depth_partial():
    d = ScalarDomain(2 * EXT, 21).test_null()
    d.calc_dndr()
    s0 = init_beam(jax.random.PRNGKey(1), 16, 1e-3, 0.0, EXT, "circular")
    # integrate only half the crossing time; back-projection still lands
    # rays on the exit plane for a null field
    rf = d.solve_at_depth(s0, depth=EXT, n_steps=16)
    np.testing.assert_allclose(np.asarray(rf[0]), np.asarray(s0[0]),
                               atol=1e-9)


def test_composed_refractometer_matches_elementwise():
    from synthpy_tpu.optics import Refractometry

    rng = np.random.default_rng(2)
    rf_m = np.zeros((4, 400))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, 400)
    rf_m[1] = rng.uniform(-2e-3, 2e-3, 400)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, 400)
    rr = Refractometry(1064e-9, jnp.asarray(rf_m))
    ref = np.asarray(rr.incoherent_solve())
    out = np.asarray(compose.apply_stages(rr.r0, compose.refractometer()))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_composed_single_lens_matches():
    rng = np.random.default_rng(3)
    rf_m = np.zeros((4, 200))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, 200)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, 200)
    sh = Shadowgraphy(532e-9, jnp.asarray(rf_m))
    ref = np.asarray(sh.single_lens_solve())
    out = np.asarray(compose.apply_stages(
        sh.r0, compose.shadowgraphy_single_lens()))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_legacy_solve_zscan_seg():
    d = ScalarDomain(2 * EXT, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    d.calc_dndr(lwl=1064e-9)
    s0 = init_beam(jax.random.PRNGKey(2), 64, 1.5e-3, 0.0, EXT, "circular")
    rf_seg = np.asarray(d.solve(s0, solver="zscan_seg", K=8))
    rf_z = np.asarray(d.solve(s0, solver="zscan"))
    # frozen-corner drift scales with cell coarseness; at 41 cells the
    # lens is resolved and the two agree to ~1%
    np.testing.assert_allclose(rf_seg[1], rf_z[1], rtol=1e-2,
                               atol=np.abs(rf_z[1]).max() * 1e-2)
