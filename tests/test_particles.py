"""Proton radiography (tracer.particles): Boris-pusher physics gates.

Closed-form gates in the spirit of the reference's analytic test fields
(SURVEY.md section 4): exact gyration, thin-slab deflection, speed
invariance, and point-projection fluence conservation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu import constants
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.ops.interp import grid_geometry
from synthpy_tpu.tracer.particles import (
    _push_boris,
    init_proton_beam,
    proton_radiograph,
    proton_speed,
    trace_protons,
)

EXT = 5e-3


def test_proton_speed_relativistic():
    v3, g3 = proton_speed(3.0)
    # gamma = 1 + 3/938.272... ; v = c sqrt(1 - 1/gamma^2)
    g_ref = 1.0 + 3.0 / constants.PROTON_REST_MEV
    assert abs(g3 - g_ref) < 1e-12
    assert abs(v3 - constants.C * math.sqrt(1 - 1 / g_ref**2)) < 1e-3
    # 14.7 MeV D3He protons: ~0.174 c
    v14, _ = proton_speed(14.7)
    assert 0.17 < v14 / constants.C < 0.18


def test_boris_uniform_bz_gyration_and_speed_invariance():
    """Uniform Bz: the pusher holds |v| to machine precision and the
    orbit radius matches the relativistic gyroradius gamma*m*v/(qB)."""
    B0 = 20.0  # T (z-pinch-class field)
    v, gamma = proton_speed(3.0)
    r_g = gamma * constants.M_PROTON * v / (constants.E_CHARGE * B0)

    # grid large enough to hold the orbit; uniform Bz everywhere
    L = 6 * r_g
    n = 9
    grid = jnp.zeros((n, n, n, 3)).at[..., 2].set(B0)
    coords = tuple(jnp.linspace(-L, L, n) for _ in range(3))
    origin, inv_spacing = grid_geometry(coords)

    # start at (r_g, 0, 0) moving -y: qv x B points -x (centripetal), so
    # the orbit circles the ORIGIN with radius r_g
    s = jnp.array([[r_g, 0.0, 0.0, 0.0, -v, 0.0]], jnp.float32)
    period = 2 * jnp.pi * gamma * constants.M_PROTON / (
        constants.E_CHARGE * B0)
    n_steps = 1024
    dt = jnp.float32(period / n_steps)
    out = np.asarray(_push_boris(s, grid, origin, inv_spacing, dt,
                                 n_steps=n_steps, gamma=gamma))
    # speed invariant (Boris rotation is exact)
    sp = np.sqrt((out[0, 3:] ** 2).sum())
    np.testing.assert_allclose(sp, v, rtol=1e-6)
    # one full period returns to the start; radius stays r_g
    np.testing.assert_allclose(out[0, 0], r_g, rtol=2e-3)
    assert abs(out[0, 1]) < 5e-3 * r_g
    r_mid = np.asarray(_push_boris(s, grid, origin, inv_spacing, dt,
                                   n_steps=n_steps // 2, gamma=gamma))
    np.testing.assert_allclose(np.hypot(r_mid[0, 0], r_mid[0, 1]), r_g,
                               rtol=2e-3)


def test_slab_deflection_matches_analytic():
    """Thin uniform-Bx slab, probing z: deflection angle in y is
    -q Bx L_slab / (gamma m v) (F = q v x B with v ~ v zhat)."""
    Bx = 5.0
    n = 33
    d = ScalarDomain(2 * EXT, n)
    B = np.zeros((n, n, n, 3), np.float32)
    B[..., 0] = Bx
    d.external_B(B)

    v, gamma = proton_speed(14.7)
    s0 = jnp.array([[0.0, 0.0, -2 * EXT, 0.0, 0.0, v]], jnp.float32)
    sf = np.asarray(trace_protons(s0, d, 14.7, steps_per_cell=8.0))
    # v x B = v zhat x Bx xhat = v Bx yhat -> deflection in +y
    theta_ref = constants.E_CHARGE * Bx * (2 * EXT) / (
        gamma * constants.M_PROTON * v)
    theta = sf[0, 4] / sf[0, 5]
    np.testing.assert_allclose(theta, theta_ref, rtol=5e-3)
    # speed still invariant through entry/exit interpolation ramps
    np.testing.assert_allclose(np.sqrt((sf[0, 3:] ** 2).sum()), v,
                               rtol=1e-6)


def test_point_projection_radiograph_conservation_and_structure():
    """Zero field -> every proton lands on the detector (fluence
    conserved, smooth cone); turbulent solenoidal B -> same count but
    restructured fluence (the deflectometry signal)."""
    from synthpy_tpu.fields.grf import grf_vector_solenoidal, power_law

    n = 32
    Np = 20000
    d0 = ScalarDomain(2 * EXT, n)
    d0.external_B(np.zeros((n, n, n, 3), np.float32))
    key = jax.random.PRNGKey(3)
    s0 = init_proton_beam(key, Np, 14.7, source_distance=10e-3,
                          extent=EXT, cone_radius=0.5 * EXT)
    sf0 = trace_protons(s0, d0, 14.7, ray_chunk=8192)
    H0 = np.asarray(proton_radiograph(sf0, detector_distance=100e-3,
                                      extent=EXT, bins=(64, 48),
                                      Lx=70.0, Ly=70.0))
    assert H0.sum() == Np  # all protons arrive (field-free cone)

    dB = ScalarDomain(2 * EXT, n)
    _, Bf = grf_vector_solenoidal(jax.random.PRNGKey(5), power_law(3.667),
                                  l_max=2e-3, l_min=0.5e-3, extent=EXT,
                                  res=n // 2, rms=5.0)
    dB.external_B(np.asarray(Bf, np.float32))
    sfB = trace_protons(s0, dB, 14.7, ray_chunk=8192)
    HB = np.asarray(proton_radiograph(sfB, detector_distance=100e-3,
                                      extent=EXT, bins=(64, 48),
                                      Lx=70.0, Ly=70.0))
    assert HB.sum() <= Np
    assert HB.sum() >= 0.95 * Np  # few protons deflect off-detector
    # the field restructures the fluence measurably
    diff = np.abs(HB - H0).sum() / H0.sum()
    assert diff > 0.05, diff


def test_b_table_tiers_accuracy_and_host_build():
    """Quantised B tables (the 1024^3-fit lever): bf16 within ~0.6% and
    dithered int8 within ~2% RMS exit-velocity deflection of the f32
    trace on a turbulent field, built from a HOST-resident grid."""
    from synthpy_tpu.fields.grf import grf_vector_solenoidal, power_law
    from synthpy_tpu.tracer.particles import build_B_table

    n = 32
    Np = 4000
    d = ScalarDomain(2 * EXT, n)
    _, Bf = grf_vector_solenoidal(jax.random.PRNGKey(5), power_law(3.667),
                                  l_max=2e-3, l_min=0.5e-3, extent=EXT,
                                  res=n // 2, rms=5.0)
    d.external_B(np.asarray(Bf, np.float32), host=True)

    s0 = init_proton_beam(jax.random.PRNGKey(1), Np, 14.7,
                          source_distance=10e-3, extent=EXT,
                          cone_radius=0.5 * EXT)
    v, _ = proton_speed(14.7)
    # f32 table from the host grid == direct device-array trace
    t32 = build_B_table(d, dtype=jnp.float32, plane_batch=7)
    sf_ref = np.asarray(trace_protons(s0, d, 14.7, B_table=t32))
    d_dev = ScalarDomain(2 * EXT, n)
    d_dev.external_B(np.asarray(Bf, np.float32))
    np.testing.assert_allclose(
        sf_ref, np.asarray(trace_protons(s0, d_dev, 14.7)), rtol=1e-6)

    # deflection signal scale: RMS transverse exit velocity
    sig = np.sqrt(np.mean(sf_ref[:, 3] ** 2 + sf_ref[:, 4] ** 2))
    for dtype, dither, tol in ((jnp.bfloat16, None, 0.006),
                               (jnp.int8, 11, 0.02)):
        tab = build_B_table(d, dtype=dtype, plane_batch=7, dither=dither)
        assert tab.grid.dtype == (jnp.int8 if dtype == jnp.int8
                                  else dtype)
        sf = np.asarray(trace_protons(s0, d, 14.7, B_table=tab))
        err = np.sqrt(np.mean((sf[:, 3] - sf_ref[:, 3]) ** 2
                              + (sf[:, 4] - sf_ref[:, 4]) ** 2))
        assert err / sig < tol, (dtype, err / sig)
        # |v| invariance survives quantisation (Boris property)
        np.testing.assert_allclose(
            np.sqrt((sf[:, 3:] ** 2).sum(axis=1)), v, rtol=1e-6)

    # undithered int8: the host-quantise route (numpy divide/round/clip,
    # only int8 bytes cross the tunnel — round 5) is BIT-identical to
    # the device-quantise route
    t_host = build_B_table(d, dtype=jnp.int8, plane_batch=7)
    t_dev = build_B_table(d, dtype=jnp.int8, plane_batch=7,
                          host_quantize=False)
    assert np.array_equal(np.asarray(t_host.grid), np.asarray(t_dev.grid))
    np.testing.assert_allclose(np.asarray(t_host.scale),
                               np.asarray(t_dev.scale))
