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


def test_composed_schlieren_lf_matches_elementwise():
    rng = np.random.default_rng(4)
    rf_m = np.zeros((4, 300))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, 300)
    rf_m[1] = rng.uniform(-4e-3, 4e-3, 300)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, 300)
    sc = Schlieren(532e-9, jnp.asarray(rf_m))
    ref = np.asarray(sc.LF_solve(R=1))
    out = np.asarray(compose.apply_stages(
        sc.r0, compose.schlieren_lf(aperture_R=1)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_composed_interferometry_matches_elementwise():
    """Interferometry train with per-travel phase checkpoints equals the
    class implementation (rays AND Jones phases). Run in float64: the
    accumulated optical phase is ~1e4 rad, so in float32 ANY operation
    reordering (class vs folded matrices alike) shifts per-ray phases by
    ~0.01-0.1 rad — f64 verifies the algorithms are identical."""
    from synthpy_tpu.optics import Interferometry

    rng = np.random.default_rng(5)
    N = 400
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[1] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[3] = rng.uniform(-2e-3, 2e-3, N)
    Jf = np.stack([np.zeros(N), np.ones(N)]).astype(np.complex128)

    with jax.enable_x64(True):
        it = Interferometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
        ref_r = np.asarray(it.two_lens_solve(n_fringes=10, deg=20))
        ref_E = np.asarray(it.Jf)

        it2 = Interferometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
        E0 = compose.interfere_ref_beam(it2.r0, it2.Jf, 10, 20)
        out_r, out_E = compose.apply_stages(
            it2.r0, compose.interferometry_two_lens(), E=E0,
            wavelength=532e-9)
        np.testing.assert_allclose(np.asarray(out_r), ref_r, rtol=1e-12,
                                   atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(np.asarray(out_E), ref_E, rtol=1e-7,
                                   atol=1e-7)


def test_composed_refractometer_coherent_matches_elementwise():
    from synthpy_tpu.optics import Refractometry

    rng = np.random.default_rng(6)
    N = 400
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[1] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    Jf = np.stack([np.ones(N), np.ones(N)]).astype(np.complex128)

    with jax.enable_x64(True):
        rc = Refractometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
        ref_r = np.asarray(rc.coherent_solve())
        ref_E = np.asarray(rc.Jf)

        rc2 = Refractometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
        out_r, out_E = compose.apply_stages(
            rc2.r0, compose.refractometer_coherent(), E=rc2.Jf,
            wavelength=532e-9)
        np.testing.assert_allclose(np.asarray(out_r), ref_r, rtol=1e-12,
                                   atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(np.asarray(out_E), ref_E, rtol=1e-7,
                                   atol=1e-7)


def test_compose_fold_reduces_stage_count():
    """The composition actually folds: shadowgraphy's 7 elements become 3
    matmuls + 2 filters; interferometry's 7 matrix elements become 3."""
    st = compose.shadowgraphy_two_lens()
    assert [s[0] for s in st].count("matrix") == 3 and len(st) == 5
    st = compose.interferometry_two_lens()
    assert [s[0] for s in st].count("matrix") == 3


def test_pipeline_images_via_composed_stages():
    """The fused pipeline (now routed through compose) still matches the
    per-element class implementation for every bench, from one shared
    synthetic exit state."""
    import synthpy_tpu.pipeline as pipeline
    from synthpy_tpu.constants import C
    from synthpy_tpu.ops.histogram import complex_histogram, histogram2d
    from synthpy_tpu.optics import Interferometry, Refractometry
    from synthpy_tpu.tracer.propagator import ray_to_Jonesvector

    rng = np.random.default_rng(21)
    N = 1500
    sf = np.zeros((9, N), np.float32)
    sf[0] = rng.uniform(-2e-3, 2e-3, N)          # x
    sf[1] = rng.uniform(-2e-3, 2e-3, N)          # y
    sf[2] = EXT                                   # z at exit plane
    theta = rng.uniform(-2e-3, 2e-3, N)
    phi = rng.uniform(-2e-3, 2e-3, N)
    sf[3] = C * theta
    sf[4] = C * phi
    sf[5] = C * np.sqrt(1 - theta**2 - phi**2)
    sf[6] = 1.0                                   # amp
    sf[7] = rng.uniform(0, 2 * np.pi, N)          # phase
    sf = jnp.asarray(sf)
    bins = (30, 22)

    names = ("shadowgraphy", "schlieren_df", "schlieren_lf",
             "refractometry", "interferometry", "refractometry_coherent")
    images = pipeline._image_from_sf(
        sf, jnp.float32(EXT), diagnostic=names, probing_direction="z",
        bins=bins, lwl=1064e-9, L=400.0, R=25.0, Lx=18.0, Ly=13.5,
        focal_plane=0.0)
    imgs = dict(zip(names, images))

    rf, Jf = ray_to_Jonesvector(sf, jnp.float32(EXT),
                                probing_direction="z", return_E=True)
    classes = {
        "shadowgraphy": (Shadowgraphy, "two_lens_solve", False),
        "schlieren_df": (Schlieren, "DF_solve", False),
        "schlieren_lf": (Schlieren, "LF_solve", False),
        "refractometry": (Refractometry, "incoherent_solve", False),
        "interferometry": (Interferometry, "two_lens_solve", True),
        "refractometry_coherent": (Refractometry, "coherent_solve", True),
    }
    for name, (cls, method, coherent) in classes.items():
        diag = cls(1064e-9, rf, Jf if coherent else None)
        getattr(diag, method)()
        if coherent:
            ref = complex_histogram(diag.rf[0], diag.rf[2], diag.Jf[0],
                                    diag.Jf[1], bins[0] + 1, bins[1] + 1,
                                    18.0, 13.5)
            # float32 phase jitter (~0.05 rad/ray at 1e4 rad accumulated)
            # perturbs pixel amplitudes in BOTH implementations; demand
            # near-perfect image correlation rather than bitwise pixels
            # (exact algorithmic equality is proven in f64 above)
            a = np.asarray(imgs[name]).ravel()
            b = np.asarray(ref).ravel()
            corr = np.corrcoef(a, b)[0, 1]
            assert corr > 0.999, f"{name}: corr {corr}"
        else:
            ref, _, _ = histogram2d(diag.rf[0], diag.rf[2], bins,
                                    ((-9.0, 9.0), (-6.75, 6.75)))
            np.testing.assert_allclose(np.asarray(imgs[name]),
                                       np.asarray(ref), rtol=1e-4,
                                       atol=1e-3, err_msg=name)
