"""Tracer validation: analytic fixtures + scipy-oracle parity.

Ports the reference's validation strategy into real assertions:
  * null/slab analytic deflection checks (full_solver.py docstring tests),
  * ray-for-ray match against an independent adaptive-integrator oracle
    (the role solver_comparisons.py:64-85 played),
  * amplitude/phase/polarisation quadrature parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import (
    Beam,
    back_propagate,
    init_beam,
    ray_to_Jonesvector,
    solve,
)

from oracle import OracleTracer, ray_to_rtm

EXT = 5e-3


def make_domain(n=21, **kw):
    return ScalarDomain(2 * EXT, n, **kw)


# ---------------------------------------------------------------------------
# Beam initialisation
# ---------------------------------------------------------------------------

def test_beam_circular_geometry():
    key = jax.random.PRNGKey(0)
    s0 = init_beam(key, 4096, 2e-3, 0.0, EXT, "circular", "z")
    assert s0.shape == (9, 4096)
    r = np.hypot(np.asarray(s0[0]), np.asarray(s0[1]))
    assert r.max() <= 2e-3 + 1e-9
    np.testing.assert_allclose(np.asarray(s0[2]), -EXT)
    np.testing.assert_allclose(np.asarray(s0[5]), constants.C, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s0[6]), 1.0)  # amp
    np.testing.assert_allclose(np.asarray(s0[7]), 0.0)  # phase
    # uniform disc: mean r^2 = R^2/2
    np.testing.assert_allclose((r**2).mean(), (2e-3) ** 2 / 2, rtol=0.05)


@pytest.mark.parametrize("direction,par_axis", [("x", 0), ("y", 1), ("z", 2)])
def test_beam_probing_directions(direction, par_axis):
    s0 = init_beam(jax.random.PRNGKey(1), 256, 1e-3, 1e-3, EXT, "square",
                   direction)
    s0 = np.asarray(s0)
    np.testing.assert_allclose(s0[par_axis], -EXT)
    # dominant velocity along the probing axis
    assert np.all(s0[3 + par_axis] > 0.99 * constants.C)


def test_beam_speed_is_c():
    s0 = np.asarray(init_beam(jax.random.PRNGKey(2), 512, 1e-3, 5e-3, EXT,
                              "circular", "z"))
    v = np.sqrt(s0[3] ** 2 + s0[4] ** 2 + s0[5] ** 2)
    np.testing.assert_allclose(v, constants.C, rtol=1e-5)


def test_beam_rectangular_and_linear():
    s0 = np.asarray(init_beam(jax.random.PRNGKey(3), 512, (1e-3, 2e-3), 0.0,
                              EXT, "rectangular", "z"))
    assert np.abs(s0[0]).max() <= 1e-3 and np.abs(s0[1]).max() <= 2e-3
    s0 = np.asarray(init_beam(jax.random.PRNGKey(3), 128, 1e-3, 1e-3, EXT,
                              "linear"))
    np.testing.assert_allclose(s0[1], 0.0)  # confined to x-z plane
    np.testing.assert_allclose(s0[4], 0.0, atol=1e-3)


def test_beam_even_completes_and_fills_positions():
    # the reference's 'even' never wrote s0 (beam.py:210-227); ours must
    s0 = init_beam(jax.random.PRNGKey(4), 60, 1e-3, 0.0, EXT, "even")
    s0 = np.asarray(s0)
    ncirc = int((-1 + np.sqrt(1 + 8 * 10)) / 2)
    expect_np = 3 * (ncirc + 1) * ncirc + 1
    assert s0.shape[1] == expect_np
    r = np.hypot(s0[0], s0[1])
    assert r.max() == pytest.approx(1e-3, rel=1e-6)
    assert (r < 1e-12).sum() == 1  # exactly one centre ray


def test_beam_rect_trackers():
    s0, idx = init_beam(jax.random.PRNGKey(5), 4096, (3e-3, 3e-3), 0.0, EXT,
                        "rect_trackers", n_trackers=16)
    s0 = np.asarray(s0)
    idx = np.asarray(idx)
    assert len(idx) == 16
    np.testing.assert_allclose(s0[8, idx], 1.0)
    assert s0[8].sum() == 16
    assert np.abs(s0[0, idx]).max() <= 1e-3


def test_beam_class_wrapper():
    b = Beam(100, 1e-3, 0.0, EXT, beam_type="circular", seed=7)
    assert b.s0.shape == (9, 100) and b.Np == 100


# ---------------------------------------------------------------------------
# Analytic trace fixtures
# ---------------------------------------------------------------------------

def test_null_no_deflection():
    d = make_domain().test_null()
    s0 = init_beam(jax.random.PRNGKey(0), 128, 2e-3, 0.0, EXT, "circular")
    res = solve(s0, d)
    rf = np.asarray(res.rf)
    np.testing.assert_allclose(rf[1], 0.0, atol=1e-12)  # theta
    np.testing.assert_allclose(rf[3], 0.0, atol=1e-12)  # phi
    np.testing.assert_allclose(rf[0], np.asarray(s0[0]), atol=1e-9)
    np.testing.assert_allclose(rf[2], np.asarray(s0[1]), atol=1e-9)


def test_slab_analytic_deflection():
    """Linear slab: exit angle = -ne_0*s/nc, independent of x."""
    ne_0, s_fac = 2e23, 1.0
    d = make_domain(41).test_slab(s=s_fac, ne_0=ne_0)
    s0 = init_beam(jax.random.PRNGKey(1), 256, 2e-3, 0.0, EXT, "circular")
    res = solve(s0, d, steps_per_cell=2.0)
    rf = np.asarray(res.rf)
    omega = constants.omega_from_lwl(1064e-9)
    nc = float(constants.critical_density(omega))
    theta_expect = -ne_0 * s_fac / nc
    np.testing.assert_allclose(rf[1], theta_expect, rtol=2e-2)
    np.testing.assert_allclose(rf[3], 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# Oracle parity (ray-for-ray)
# ---------------------------------------------------------------------------

def _parity_setup(domain, Np=40, divergence=0.0, beam_size=1.5e-3, lwl=1064e-9,
                  **oracle_kw):
    s0 = init_beam(jax.random.PRNGKey(2), Np, beam_size, divergence, EXT,
                   "circular")
    oracle = OracleTracer(
        np.asarray(domain.x), np.asarray(domain.y), np.asarray(domain.z),
        np.asarray(domain.ne), lwl=lwl, **oracle_kw)
    sf_oracle = oracle.solve(np.asarray(s0), EXT)
    return s0, sf_oracle


def test_lens_oracle_parity():
    d = make_domain(41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0, sf_o = _parity_setup(d)
    res = solve(s0, d, steps_per_cell=4.0)
    sf = np.asarray(res.sf)
    # positions to sub-micron; velocities to ~4e-3 relative (fixed-step RK4
    # on a C0 piecewise-trilinear field converges ~O(h^1.3); the f64
    # convergence test below shows the residual is integrator resolution,
    # not physics)
    np.testing.assert_allclose(sf[:3], sf_o[:3], atol=3e-7)
    np.testing.assert_allclose(sf[3:6], sf_o[3:6], rtol=4e-3, atol=50.0)
    rf = np.asarray(res.rf)
    rf_o = ray_to_rtm(sf_o, EXT)
    np.testing.assert_allclose(rf[0], rf_o[0], atol=4e-7)
    np.testing.assert_allclose(rf[1], rf_o[1], rtol=4e-3, atol=1e-7)
    # a plasma density bump is a DIVERGING lens (n lower on axis): exit
    # angles correlate positively with exit x
    assert np.corrcoef(rf_o[0], rf_o[1])[0, 1] > 0.9


def test_lens_parity_converges_in_f64():
    """Error vs the adaptive oracle must shrink with step count (f64)."""
    with jax.enable_x64(True):
        d = ScalarDomain(2 * EXT, 41, dtype=jnp.float64).test_lens(
            ne_0=5e24, LR=1.5e-3)
        s0 = init_beam(jax.random.PRNGKey(2), 24, 1.5e-3, 0.0, EXT,
                       "circular", dtype=jnp.float64)
        oracle = OracleTracer(np.asarray(d.x), np.asarray(d.y),
                              np.asarray(d.z), np.asarray(d.ne))
        sf_o = oracle.solve(np.asarray(s0), EXT)
        errs = []
        for spc in (4.0, 16.0):
            sf = np.asarray(solve(s0, d, steps_per_cell=spc).sf)
            errs.append(np.abs(sf[3] - sf_o[3]).max())
    assert errs[1] < errs[0] / 3
    assert errs[1] / np.abs(sf_o[3]).max() < 1e-3


def test_phase_oracle_parity_and_analytic():
    d = make_domain(41)
    d.test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0, sf_o = _parity_setup(d, phaseshift=True)
    res = solve(s0, d, steps_per_cell=4.0)
    phase = np.asarray(res.sf[7])
    np.testing.assert_allclose(phase, sf_o[7], rtol=5e-3, atol=1e-4)
    # central ray: phi ~= omega*(n(0)-1) * (2*EXT/c) — ne constant along its
    # whole in-box path for the lens profile
    r0 = np.hypot(np.asarray(s0[0]), np.asarray(s0[1]))
    i_c = int(np.argmin(r0))
    omega = float(constants.omega_from_lwl(1064e-9))
    n_c_axis = float(constants.n_refrac(
        jnp.array(5e24 * np.exp(-(r0[i_c] / 1.5e-3) ** 2)), omega))
    phi_expect = omega * (n_c_axis - 1.0) * (2 * EXT / constants.C)
    np.testing.assert_allclose(phase[i_c], phi_expect, rtol=2e-2)


def test_inv_brems_oracle_parity():
    d = make_domain(31)
    d.test_lens(ne_0=1e25, LR=2e-3)
    d.external_Te(50.0 * np.ones(d.dims))
    d.external_Z(2.0 * np.ones(d.dims))
    d.inv_brems = True
    s0, sf_o = _parity_setup(d, Np=24, inv_brems=True,
                             Te=np.asarray(d.Te), Z=np.asarray(d.Z))
    res = solve(s0, d, steps_per_cell=4.0)
    amp = np.asarray(res.sf[6])
    assert amp.min() < 1.0  # attenuation attenuates
    np.testing.assert_allclose(amp, sf_o[6], rtol=5e-3)


def test_faraday_oracle_parity():
    d = make_domain(31)
    d.test_lens(ne_0=1e25, LR=2e-3)
    d.test_B(Bmax=10.0)
    s0, sf_o = _parity_setup(d, Np=24, B_on=True, B=np.asarray(d.B))
    res = solve(s0, d, steps_per_cell=4.0)
    pol = np.asarray(res.sf[8])
    assert np.abs(pol).max() > 0
    np.testing.assert_allclose(pol, sf_o[8], rtol=5e-3,
                               atol=np.abs(sf_o[8]).max() * 1e-3)


def test_jones_vector_construction():
    sf = jnp.zeros((9, 3))
    sf = sf.at[2].set(EXT).at[5].set(constants.C)
    sf = sf.at[6].set(2.0).at[7].set(jnp.pi / 2).at[8].set(0.0)
    rf, J = ray_to_Jonesvector(sf, EXT, return_E=True)
    np.testing.assert_allclose(np.asarray(J[1]), 2.0j, atol=1e-6)
    np.testing.assert_allclose(np.asarray(J[0]), 0.0, atol=1e-6)


def test_ray_chunking_equivalence():
    d = make_domain(21).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(3), 100, 1.5e-3, 0.0, EXT, "circular")
    r_full = solve(s0, d, n_steps=64)
    r_chunk = solve(s0, d, n_steps=64, ray_chunk=32)
    np.testing.assert_allclose(np.asarray(r_full.sf), np.asarray(r_chunk.sf),
                               rtol=1e-6, atol=1e-9)


def test_back_propagate_snaps_to_plane():
    sf = jnp.zeros((9, 2))
    sf = sf.at[0].set(jnp.array([1e-4, 2e-4]))
    sf = sf.at[2].set(EXT * 1.5)  # overshot the plane
    sf = sf.at[3].set(1e5).at[5].set(constants.C)
    out = np.asarray(back_propagate(sf, EXT, "z"))
    np.testing.assert_allclose(out[2], EXT)
    # x rolled back by vx * t_bp
    t_bp = (EXT * 1.5 - EXT) / constants.C
    np.testing.assert_allclose(out[0], np.array([1e-4, 2e-4]) - 1e5 * t_bp,
                               rtol=1e-6)


def test_probing_direction_x_roundtrip():
    d = make_domain(21, probing_direction="x").test_null()
    s0 = init_beam(jax.random.PRNGKey(4), 64, 1e-3, 0.0, EXT, "circular", "x")
    res = solve(s0, d)
    rf = np.asarray(res.rf)
    np.testing.assert_allclose(rf[0], np.asarray(s0[1]), atol=1e-9)
    np.testing.assert_allclose(rf[2], np.asarray(s0[2]), atol=1e-9)


def test_atten_sign_bug_compat_reciprocal():
    # the reference's legacy solver GROWS the amplitude (+kappa,
    # full_solver.py:540); atten_sign=+1.0 reproduces that for
    # cross-validation. d(amp)/dt = sign*kappa*amp, so over the same
    # trajectory the two amplitudes are exact reciprocals.
    d = make_domain(31)
    d.test_lens(ne_0=1e25, LR=2e-3)
    d.external_Te(50.0 * np.ones(d.dims))
    d.external_Z(2.0 * np.ones(d.dims))
    d.inv_brems = True
    key = jax.random.PRNGKey(3)
    s0 = init_beam(key, 16, 2e-3, 0.0, EXT, "circular", "z")
    amp_fix = np.asarray(solve(s0, d, steps_per_cell=4.0).sf[6])
    amp_bug = np.asarray(
        solve(s0, d, steps_per_cell=4.0, atten_sign=+1.0).sf[6])
    assert amp_fix.min() < 1.0 and amp_bug.max() > 1.0
    np.testing.assert_allclose(amp_fix * amp_bug, 1.0, rtol=1e-4)
