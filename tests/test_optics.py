"""Tests for RTM primitives, diagnostics benches, and Fresnel propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal.windows import tukey as scipy_tukey

from synthpy_tpu.ops import fresnel as fz
from synthpy_tpu.optics import (
    Diagnostic,
    Interferometry,
    Refractometry,
    Schlieren,
    Shadowgraphy,
)
from synthpy_tpu.optics.rtm import (
    circular_aperture,
    circular_stop,
    knife_edge,
    lens,
    m_to_mm,
    sym_lens,
    travel,
)


# ---------------------------------------------------------------------------
# RTM primitives
# ---------------------------------------------------------------------------

def test_travel_and_lens_abcd():
    r = jnp.array([[1.0], [0.1], [-2.0], [0.05]])
    out = np.asarray(travel(r, 10.0))
    np.testing.assert_allclose(out[:, 0], [2.0, 0.1, -1.5, 0.05], rtol=1e-6)
    out = np.asarray(sym_lens(r, 5.0))
    np.testing.assert_allclose(out[:, 0], [1.0, 0.1 - 1 / 5, -2.0,
                                           0.05 + 2 / 5], rtol=1e-6)
    out = np.asarray(lens(r, 5.0, 10.0))
    np.testing.assert_allclose(out[1, 0], 0.1 - 1 / 5, rtol=1e-6)
    np.testing.assert_allclose(out[3, 0], 0.05 + 2 / 10, rtol=1e-6)


def test_apertures_kill_with_nan():
    r = jnp.array([[0.0, 3.0, 0.5], [0.0] * 3, [0.0, 4.0, 0.0], [0.0] * 3])
    out = np.asarray(circular_aperture(r, 1.0))
    assert np.isnan(out[:, 1]).all()
    assert np.isfinite(out[:, 0]).all() and np.isfinite(out[:, 2]).all()
    out = np.asarray(circular_stop(r, 1.0))
    assert np.isnan(out[:, 0]).all() and np.isnan(out[:, 2]).all()
    assert np.isfinite(out[:, 1]).all()
    out = np.asarray(knife_edge(r, 0.2, axis="x", direction=1))
    assert np.isnan(out[:, 1]).all() and np.isnan(out[:, 2]).all()


def test_aperture_filters_jones_too():
    r = jnp.array([[0.0, 3.0], [0.0] * 2, [0.0, 4.0], [0.0] * 2])
    E = jnp.ones((2, 2), jnp.complex64)
    r2, E2 = circular_aperture(r, 1.0, E=E)
    assert np.isnan(np.asarray(E2)[:, 1].real).all()
    assert np.isfinite(np.asarray(E2)[:, 0].real).all()


def _matrix_of(solve_chain):
    """Extract the effective ABCD matrix of a bench by probing basis rays."""
    basis = jnp.eye(4)
    out = solve_chain(basis * 1e-6) / 1e-6  # small rays: avoid apertures
    return np.asarray(out)


def test_two_lens_telescope_images_object_plane():
    """Shadowgraphy two-lens bench: imaging condition B = 0, |M| = 1."""
    sh = Shadowgraphy(532e-9, jnp.zeros((4, 1)), L=400, R=1e9)

    def chain(r):
        sh.r0 = r
        return sh.two_lens_solve()

    M = _matrix_of(chain)
    assert abs(M[0, 1]) < 1e-3 * 400  # B ~ 0: positions independent of angle
    np.testing.assert_allclose(abs(M[0, 0]), 1.0, rtol=1e-6)  # |M| = 1


def test_single_lens_magnification_two():
    sh = Shadowgraphy(532e-9, jnp.zeros((4, 1)), L=400, R=1e9)

    def chain(r):
        sh.r0 = r
        return sh.single_lens_solve()

    M = _matrix_of(chain)
    assert abs(M[0, 1]) < 1e-3 * 400
    np.testing.assert_allclose(abs(M[0, 0]), 2.0, rtol=1e-6)  # M = 2


def test_schlieren_dark_field_blocks_undeflected():
    """Collimated rays die at the DF stop; strongly deflected rays pass."""
    N = 64
    rng = np.random.default_rng(0)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-1e-3, 1e-3, N)   # +-1 mm in metres
    rf_m[2] = rng.uniform(-1e-3, 1e-3, N)
    rf_m[1, : N // 2] = 5e-3                 # deflected half: 5 mrad > R/L
    sc = Schlieren(532e-9, jnp.asarray(rf_m), L=400, R=25)
    sc.DF_solve(R=1)
    H = np.asarray(sc.histogram(bin_scale=8))
    assert H.sum() == N // 2  # only the deflected half arrives

    sc2 = Schlieren(532e-9, jnp.asarray(rf_m), L=400, R=25)
    sc2.LF_solve(R=1)
    H2 = np.asarray(sc2.histogram(bin_scale=8))
    assert H2.sum() == N - N // 2  # only the undeflected half


def test_shadowgraphy_end_to_end_counts():
    N = 1000
    rng = np.random.default_rng(1)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    sh = Shadowgraphy(532e-9, jnp.asarray(rf_m))
    sh.two_lens_solve()
    H = np.asarray(sh.histogram(bin_scale=8))
    assert H.sum() == N  # M=1 telescope: everything lands on the detector
    # image occupies the central +-2 mm
    ny, nx = H.shape
    xs = np.linspace(-9, 9, nx)
    occupied = np.where(H.sum(axis=0) > 0)[0]
    assert abs(xs[occupied].min() + 2.0) < 0.3
    assert abs(xs[occupied].max() - 2.0) < 0.3


def test_interferometry_fringe_frequency():
    """Uniform-phase beam + tilted reference -> fringes at 2*n/3 rad/mm."""
    N = 200_000
    rng = np.random.default_rng(2)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-4e-3, 4e-3, N)
    rf_m[2] = rng.uniform(-4e-3, 4e-3, N)
    Jf = np.stack([np.zeros(N), np.ones(N)]).astype(np.complex64)
    it = Interferometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
    it.interfere_ref_beam(n_fringes=10, deg=0)  # vertical fringes
    H = np.asarray(it.interferogram(bin_scale=16))
    # fringes along x with spatial frequency 2*10/3 rad/mm
    ny, nx = H.shape
    profile = H[ny // 4: 3 * ny // 4].mean(axis=0)
    sel = profile > 0
    x_mm = np.linspace(-9, 9, nx)[sel]
    prof = profile[sel] - profile[sel].mean()
    freqs = np.fft.rfftfreq(len(prof), d=x_mm[1] - x_mm[0])  # cycles/mm
    peak = freqs[np.argmax(np.abs(np.fft.rfft(prof))[1:]) + 1]
    expect = (2 * 10 / 3) / (2 * np.pi)
    assert peak == pytest.approx(expect, rel=0.15)


def test_interferometry_two_lens_and_bkg():
    N = 5000
    rng = np.random.default_rng(3)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    Jf = np.stack([np.zeros(N), np.exp(0.3j * np.ones(N))]).astype(complex)
    it = Interferometry(1064e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
    it.two_lens_solve(n_fringes=10, deg=20)
    H = np.asarray(it.interferogram(bin_scale=16))
    assert np.isfinite(H).all() and H.max() > 0
    Jf_post = np.asarray(it.Jf).copy()
    rf_post = np.asarray(it.rf).copy()
    bkg = np.asarray(it.bkg(n_fringes=10, deg=20, bin_scale=16))
    assert np.isfinite(bkg).all() and bkg.max() > 0
    # state restored after bkg
    np.testing.assert_array_equal(np.asarray(it.Jf), Jf_post)
    np.testing.assert_array_equal(np.asarray(it.rf), rf_post)


def test_refractometry_solves():
    N = 2000
    rng = np.random.default_rng(4)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[1] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    Jf = np.stack([np.zeros(N), np.ones(N)]).astype(complex)
    rr = Refractometry(1064e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
    rr.incoherent_solve()
    H = np.asarray(rr.histogram(bin_scale=16))
    assert H.sum() > 0
    rr2 = Refractometry(1064e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
    rr2.coherent_solve()
    H2 = np.asarray(rr2.refractogram(bin_scale=16))
    assert np.isfinite(H2).all() and H2.max() > 0
    # speckle variant runs
    rr2.refractogram(bin_scale=16, speckle_phase=0.8,
                     key=jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# Fresnel / angular spectrum
# ---------------------------------------------------------------------------

def test_tukey_matches_scipy():
    for M, a in ((64, 0.4), (65, 0.25), (32, 1.0)):
        np.testing.assert_allclose(np.asarray(fz.tukey(M, a)),
                                   scipy_tukey(M, a), atol=1e-6)


def test_fresnel_gaussian_beam_expands_correctly():
    """Angular-spectrum propagation must reproduce Gaussian-beam optics:
    w(z) = w0 sqrt(1 + (z/zR)^2)."""
    lwl = 532e-9
    w0 = 100e-6
    Lside = 2e-3
    N = 256
    x = np.linspace(-Lside / 2, Lside / 2, N, endpoint=False)
    XX, YY = np.meshgrid(x, x, indexing="ij")
    U0 = np.exp(-(XX**2 + YY**2) / w0**2).astype(complex)

    zR = np.pi * w0**2 / lwl
    z = 2 * zR
    w_expect = w0 * np.sqrt(1 + (z / zR) ** 2)

    U0p = fz.prepare_field_for_propagation(jnp.asarray(U0), pad_factor=2)
    Uz = np.asarray(fz.fresnel_propagate(U0p, (Lside, Lside), lwl, z,
                                         (N, N), pad_factor=2))
    I = np.abs(Uz) ** 2
    # fit 1/e^2 intensity radius along the central row
    row = I[N // 2]
    w_meas = np.sqrt(2 * np.sum(row * x**2) / np.sum(row))
    # for I ~ exp(-2 r^2 / w^2): sqrt(2 <x^2>) = w/sqrt(2) * sqrt(2) = w...
    # <x^2> weighted by I = w^2/4, so w = 2 sqrt(<x^2>)
    w_meas = 2 * np.sqrt(np.sum(row * x**2) / np.sum(row))
    assert w_meas == pytest.approx(w_expect, rel=0.05)


def test_fresnel_energy_reasonable():
    """|H| = 1: propagation without window must conserve FFT energy."""
    lwl, z = 532e-9, 1e-2
    N = 64
    fx = np.fft.fftfreq(N, d=1e-5)
    FX, FY = np.meshgrid(fx, fx, indexing="ij")
    H = np.exp(-1j * np.pi * lwl * z * (FX**2 + FY**2))
    np.testing.assert_allclose(np.abs(H), 1.0, atol=1e-12)


def test_fresnel_propagate_via_rays():
    """End-to-end: deposit rays, propagate, intensity stays finite/centred."""
    N = 40_000
    rng = np.random.default_rng(5)
    rays = np.zeros((4, N))
    rays[0] = rng.uniform(-1.0, 1.0, N)  # mm
    rays[2] = rng.uniform(-1.0, 1.0, N)
    r2 = rays[0] ** 2 + rays[2] ** 2
    amp = np.exp(-r2 / 0.25)
    phase = np.zeros(N)
    x = jnp.linspace(-1.0, 1.0, 64)
    U = np.asarray(fz.propagate(532e-9, x, x, 2e-3, 2e-3,
                                jnp.asarray(rays), jnp.asarray(amp),
                                jnp.asarray(phase), z=5e-3))
    assert U.shape == (64, 64)
    I = np.abs(U) ** 2
    assert np.isfinite(I).all()
    # beam stays centred
    i, j = np.unravel_index(np.argmax(I), I.shape)
    assert abs(i - 32) < 8 and abs(j - 32) < 8


def test_refractometry_fresnel_solve():
    N = 20_000
    rng = np.random.default_rng(6)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-1e-3, 1e-3, N)
    rf_m[2] = rng.uniform(-1e-3, 1e-3, N)
    amp = np.ones(N)
    phase = rng.uniform(0, 0.1, N)
    x = jnp.linspace(-1.0, 1.0, 64)  # mm grid to match mm ray coords
    rr = Refractometry(1064e-9, jnp.asarray(rf_m), None, x=x, y=x,
                       x_l=2e-3, y_l=2e-3, amp=jnp.asarray(amp),
                       phase=jnp.asarray(phase))
    H = np.asarray(rr.fresnel_solve(z=5e-3))
    assert H.shape == (64, 64) and np.isfinite(H).all() and H.max() > 0


def test_fresnel_resample_to_detector():
    """resample_to_detector maps |U|^2 onto the histogram pixel layout:
    shape matches `histogram`, in-grid pixels interpolate the deposition
    values, pixels outside the deposition extent read exactly 0."""
    N = 20_000
    rng = np.random.default_rng(7)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-1e-3, 1e-3, N)
    rf_m[2] = rng.uniform(-1e-3, 1e-3, N)
    amp = np.ones(N)
    phase = rng.uniform(0, 0.1, N)
    x = jnp.linspace(-1.0, 1.0, 64)  # deposition grid: central 2x2 mm
    rr = Refractometry(1064e-9, jnp.asarray(rf_m), None, x=x, y=x,
                       x_l=2e-3, y_l=2e-3, amp=jnp.asarray(amp),
                       phase=jnp.asarray(phase))
    rr.fresnel_solve(z=5e-3)
    img = np.asarray(rr.resample_to_detector(bin_scale=16))
    assert img.shape == (2574 // 16, 3448 // 16)
    assert np.isfinite(img).all() and img.max() > 0
    # the deposition grid covers only |x| <= 1 mm of the 18 x 13.5 mm
    # detector: the outer pixels must be exactly zero
    assert img[0, :].max() == 0 and img[:, 0].max() == 0
    # centre pixel interpolates the central deposition intensity
    cy, cx = img.shape[0] // 2, img.shape[1] // 2
    H = np.asarray(rr.H)
    assert abs(img[cy, cx] - H[32, 32]) < 0.5 * abs(H[32, 32]) + 1e-12
    # energy scale preserved where grids overlap (interpolation, not
    # rebinning: values, not counts)
    assert img.max() <= H.max() * (1 + 1e-6)


def test_focal_plane_shifts_object_plane():
    """focal_plane moves the imaged plane: a tilted ray bundle that crosses
    x=0 at depth fp images to the centre only when focal_plane = fp."""
    N = 1
    rf_m = np.zeros((4, N))
    rf_m[0] = 1e-3      # 1 mm off-axis at domain exit
    rf_m[1] = -0.01     # heading back toward the axis
    # ray crosses x=0 at 100 mm behind the exit plane
    sh_on = Shadowgraphy(532e-9, jnp.asarray(rf_m), focal_plane=-100)
    sh_on.two_lens_solve()
    sh_off = Shadowgraphy(532e-9, jnp.asarray(rf_m), focal_plane=0)
    sh_off.two_lens_solve()
    x_on = float(np.asarray(sh_on.rf[0, 0]))
    x_off = float(np.asarray(sh_off.rf[0, 0]))
    # with the object plane at the crossing the image sits on the axis
    assert abs(x_on) < 0.02
    assert abs(x_off) > 0.5


def test_knife_edge_directions():
    from synthpy_tpu.optics.rtm import knife_edge

    r = jnp.array([[0.0, 1.0, -1.0], [0.0] * 3, [0.5, -0.5, 0.2],
                   [0.0] * 3])
    out = np.asarray(knife_edge(r, 0.0, axis="x", direction=-1))
    assert np.isnan(out[:, 2]).all()          # x < 0 killed
    assert np.isfinite(out[:, 1]).all()
    out = np.asarray(knife_edge(r, 0.0, axis="y", direction=1))
    assert np.isnan(out[:, 0]).all() and np.isnan(out[:, 2]).all()


def test_interferogram_intensity_convention_fringe_contrast():
    """Intensity convention: uniform beam + tilted reference gives fringes
    with the same carrier as the legacy amplitude convention, and
    near-unity Michelson contrast (equal-amplitude two-wave interference:
    I = 2 + 2cos(phi) per unit density -> (Imax-Imin)/(Imax+Imin) = 1)."""
    N = 400_000
    rng = np.random.default_rng(3)
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-4e-3, 4e-3, N)
    rf_m[2] = rng.uniform(-4e-3, 4e-3, N)
    Jf = np.stack([np.zeros(N), np.ones(N)]).astype(np.complex64)
    it = Interferometry(532e-9, jnp.asarray(rf_m), jnp.asarray(Jf))
    it.interfere_ref_beam(n_fringes=10, deg=0)
    H_int = np.asarray(it.interferogram(bin_scale=16,
                                        convention="intensity"))
    H_leg = np.asarray(it.interferogram(bin_scale=16))

    from synthpy_tpu.analysis.fringes import carrier_frequency

    # same carrier detected in both conventions (fringes survive)
    assert carrier_frequency(H_int) == carrier_frequency(H_leg)

    # Michelson contrast in the occupied region, averaged along fringes:
    # normalise out the ray-count density by dividing by a blurred count
    ny, nx = H_int.shape
    prof = H_int[ny // 4: 3 * ny // 4].mean(axis=0)
    sel = prof > 0
    p = prof[sel]
    contrast = (p.max() - p.min()) / (p.max() + p.min())
    assert contrast > 0.8


def test_shadowgraphy_single_exp_solve():
    """Variable detector arm (legacy rtm_solver.py:216-222): detL = L/2
    puts the detector near the lens focal plane (point focus for a
    collimated beam); detL = 3L/2 reproduces single_lens_solve modulo the
    object-plane offset."""
    rng = np.random.default_rng(7)
    N = 2000
    rf_m = np.zeros((4, N))
    rf_m[0] = rng.uniform(-2e-3, 2e-3, N)
    rf_m[2] = rng.uniform(-2e-3, 2e-3, N)
    sh = Shadowgraphy(532e-9, jnp.asarray(rf_m))
    out_focus = np.asarray(sh.single_exp_solve(detL=200))  # f = L/2 = 200
    # collimated beam focuses: transverse extent collapses
    spread_focus = np.nanstd(out_focus[0])
    sh2 = Shadowgraphy(532e-9, jnp.asarray(rf_m))
    out_img = np.asarray(sh2.single_exp_solve(detL=600))
    spread_img = np.nanstd(out_img[0])
    assert spread_focus < 1e-3 * spread_img

    # composed train equals elementwise
    from synthpy_tpu.optics import compose
    out_c = np.asarray(compose.apply_stages(
        sh2.r0, compose.shadowgraphy_single_exp(detL=600)))
    np.testing.assert_allclose(out_c, out_img, rtol=1e-5, atol=1e-6,
                               equal_nan=True)


def test_propagate_E_legacy_mm_wavenumber_switch():
    """Round-2 closure: the bug-compat switch reproduces the reference's
    mm-path x 1/m-wavenumber phase convention (diagnostics.py:315-321),
    which overstates inter-element phases by exactly 1e3."""
    lwl = 532e-9
    # sub-micron transverse paths keep BOTH conventions' phases small
    # enough that f32 trig is exact at the test tolerance
    rf = jnp.asarray([[1e-4, 2e-4], [0.0, 0.0], [0.5e-4, -1e-4],
                      [0.0, 0.0]])
    Jf = jnp.ones((2, 2), jnp.complex64)
    r0 = jnp.zeros((4, 2))

    d_fix = Diagnostic(lwl, rf, Jf)
    d_fix.propagate_E(rf, r0)
    d_leg = Diagnostic(lwl, rf, Jf, legacy_mm_wavenumber=True)
    d_leg.propagate_E(rf, r0)

    k = 2 * np.pi / lwl
    path_mm = np.sqrt(np.asarray(rf[0]) ** 2 + np.asarray(rf[2]) ** 2)
    np.testing.assert_allclose(np.angle(np.asarray(d_fix.Jf[0])),
                               np.angle(np.exp(1j * k * path_mm * 1e-3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.angle(np.asarray(d_leg.Jf[0])),
                               np.angle(np.exp(1j * k * path_mm)),
                               atol=1e-3)



def test_rect_aperture_parity_vs_exact_modes():
    from synthpy_tpu.optics.rtm import rect_aperture
    # four probes: inside; outside x only; outside y only; outside both
    r = jnp.array([[0.0, 3.0, 0.0, 3.0],
                   [0.0] * 4,
                   [0.0, 0.0, 4.0, 4.0],
                   [0.0] * 4])
    # parity default = reference corner-clip bug (diagnostics.py:212-223):
    # only the outside-BOTH ray dies
    out = np.asarray(rect_aperture(r, 1.0, 1.0))
    assert np.isfinite(out[:, :3]).all()
    assert np.isnan(out[:, 3]).all()
    # exact=True = true rectangle: every out-of-bounds ray dies
    out = np.asarray(rect_aperture(r, 1.0, 1.0, exact=True))
    assert np.isfinite(out[:, 0]).all()
    assert np.isnan(out[:, 1:]).all()
