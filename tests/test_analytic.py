"""Pack-free analytic march (tracer.analytic): closed-form parity.

The analytic tracer evaluates the reference's own validation fields
(full_solver.py:130-167, minimal_solver.py:192-213) in closed form with
jax.grad gradients — no pack, no gathers. These tests pin it against
closed-form ray solutions (constant-acceleration slab, uniform-field
phase/attenuation/Faraday integrals), against the gridded segment march
(converging as the grid refines), and bit-for-bit across ray chunking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants, pipeline
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import (init_beam, solve_zscan_analytic,
                                solve_zscan_segments)

EXT = 5e-3
LWL = 1064e-9


def _beam(n=512, key=0, size=2e-3):
    return init_beam(jax.random.PRNGKey(key), n, size, 0.0, EXT, "circular")


def test_null_field_straight_lines():
    dom = ScalarDomain(2 * EXT, 33).test_null()
    s0 = _beam(256)
    res = solve_zscan_analytic(s0, dom)
    sf = np.asarray(res.sf)
    s0n = np.asarray(s0)
    # x advances by vx/vz * L; vz = c, vx = 0 for a divergence-0 beam
    np.testing.assert_allclose(sf[0], s0n[0], rtol=0, atol=1e-9)
    np.testing.assert_allclose(sf[3:6], s0n[3:6], rtol=1e-7)
    np.testing.assert_allclose(sf[6], 1.0)  # amp untouched
    np.testing.assert_allclose(sf[7], 0.0)  # phase
    np.testing.assert_allclose(sf[8], 0.0)  # pol


def test_slab_constant_acceleration_closed_form():
    """ne linear in x => constant transverse acceleration: the midpoint
    rule is EXACT (quadratic trajectory), so the only error is f32."""
    ne_0, s = 2e23, 1.0
    dom = ScalarDomain(2 * EXT, 65).test_slab(s=s, ne_0=ne_0)
    s0 = _beam(128, size=1e-3)
    res = solve_zscan_analytic(s0, dom, integrator="rk2")
    nc = constants.critical_density(constants.omega_from_lwl(LWL))
    G = -0.5 * constants.C**2 * (ne_0 * s / EXT) / nc
    s0n = np.asarray(s0)
    L = 2 * EXT
    vx_exact = s0n[3] + G * L / s0n[5]
    x_exact = s0n[0] + s0n[3] / s0n[5] * L + 0.5 * G * (L / s0n[5]) ** 2
    sf = np.asarray(res.sf)
    np.testing.assert_allclose(sf[3], vx_exact, rtol=2e-6)
    np.testing.assert_allclose(sf[0], x_exact, rtol=0,
                               atol=2e-6 * np.abs(x_exact).max())


def test_lens_converges_to_gridded_march():
    """The gridded march converges to the analytic (grid-free) trace as
    the grid refines — the discretisation error is the GRID's."""
    s0 = _beam(512)
    errs = []
    for dim in (33, 65, 129):
        dom = ScalarDomain(2 * EXT, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        ra = solve_zscan_analytic(s0, dom, n_steps=256)
        rg = solve_zscan_segments(s0, dom, K=dim - 1)
        errs.append(float(jnp.max(jnp.abs(ra.sf[3] - rg.sf[3]))))
    assert errs[2] < errs[1] < errs[0]
    # and at 129^3 the agreement is at the percent level (the gridded
    # march's bilinear-interp error on a 19-cells-per-LR Gaussian)
    vscale = float(jnp.max(jnp.abs(ra.sf[3])))
    assert errs[2] < 2e-2 * vscale


def test_uniform_phase_attenuation_faraday_integrals():
    """Uniform ne + Bz: phase, amplitude and polarisation have exact
    closed-form integrals (zero gradient => straight rays)."""
    ne_c, Te_c, Z_c, Bz = 1e24, 100.0, 2.0, 5.0
    dom = ScalarDomain(2 * EXT, 33, inv_brems=True, phaseshift=True,
                       B_on=True)
    dom.analytic = {
        "ne": lambda x, y, z: ne_c + 0.0 * (x + y + z),
        "Te": lambda x, y, z: Te_c + 0.0 * x,
        "Z": lambda x, y, z: Z_c + 0.0 * x,
        "B": lambda x, y, z: (jnp.zeros_like(x), jnp.zeros_like(x),
                              Bz + 0.0 * x),
    }
    s0 = _beam(64, size=1e-3)
    res = solve_zscan_analytic(s0, dom, lwl=LWL, integrator="rk2")
    sf = np.asarray(res.sf)
    omega = constants.omega_from_lwl(LWL)
    L = 2 * EXT
    vz = np.asarray(s0)[5]
    phase_exact = omega * (constants.n_refrac(ne_c, omega) - 1.0) * L / vz
    kap = float(constants.kappa(jnp.asarray(ne_c), jnp.asarray(Te_c),
                                jnp.asarray(Z_c), omega))
    amp_exact = np.exp(-kap * L / vz)
    # dpol/dz = Verdet * ne * (B . v) / vz = Verdet * ne * Bz (for B||z)
    pol_exact = constants.verdet_constant(LWL) * ne_c * Bz * L
    np.testing.assert_allclose(sf[7], phase_exact, rtol=1e-5)
    np.testing.assert_allclose(sf[6], amp_exact, rtol=1e-5)
    np.testing.assert_allclose(sf[8], pol_exact, rtol=1e-3)


def test_outside_box_fill_zero_matches_gridded():
    """Rays that start outside the transverse box free-fly (channel
    fill 0), exactly like the gridded fill_value=0 semantics."""
    dom = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = np.array(_beam(16))
    s0[0] += 1.0  # 1 m off-axis: far outside the 1 cm box
    res = solve_zscan_analytic(jnp.asarray(s0), dom)
    sf = np.asarray(res.sf)
    np.testing.assert_allclose(sf[3], s0[3], rtol=1e-7)
    np.testing.assert_allclose(sf[4], s0[4], rtol=1e-7)


def test_ray_chunking_bit_identical():
    dom = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = _beam(1000)
    r1 = solve_zscan_analytic(s0, dom)
    r2 = solve_zscan_analytic(s0, dom, ray_chunk=256)
    assert float(jnp.max(jnp.abs(r1.sf - r2.sf))) == 0.0


def test_pipeline_run_analytic_image_close_to_gridded():
    dim = 65
    dom = ScalarDomain(2 * EXT, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = _beam(20000)
    Ha = pipeline.run(dom, s0, solver="analytic", bins=(61, 41))
    Hg = pipeline.run(dom, s0, solver="zscan_seg", bins=(61, 41))
    assert float(Ha.sum()) == pytest.approx(float(Hg.sum()))
    assert float(jnp.abs(Ha - Hg).sum() / Hg.sum()) < 0.06


def test_pipeline_run_analytic_requires_closures():
    dom = ScalarDomain(2 * EXT, 17)
    dom.external_ne(np.zeros((17, 17, 17), np.float32))
    s0 = _beam(16)
    with pytest.raises(ValueError, match="analytic"):
        pipeline.run(dom, s0, solver="analytic", critical_guard=None,
                     bins=(8, 8))


def test_external_fields_clear_analytic():
    dom = ScalarDomain(2 * EXT, 17).test_lens()
    assert dom.analytic is not None
    dom.external_ne(np.zeros((17, 17, 17), np.float32))
    assert dom.analytic is None


def test_rk4_matches_rk2_on_smooth_lens():
    dom = ScalarDomain(2 * EXT, 65).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = _beam(256)
    r2 = solve_zscan_analytic(s0, dom, integrator="rk2")
    r4 = solve_zscan_analytic(s0, dom, integrator="rk4")
    vscale = float(jnp.max(jnp.abs(r4.sf[3])))
    assert float(jnp.max(jnp.abs(r2.sf[3] - r4.sf[3]))) < 1e-4 * vscale


def test_analytic_mesh_sharding_matches_single_device():
    """pipeline.run(mesh=) shards the analytic trace over the fake mesh
    with an image identical to the single-device run."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the fake multi-device mesh")
    dom = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = _beam(4096)
    H1 = pipeline.run(dom, s0, solver="analytic", bins=(31, 21))
    mesh = Mesh(np.array(jax.devices()[:4]), ("rays",))
    Hm = pipeline.run(dom, s0, solver="analytic", bins=(31, 21), mesh=mesh)
    np.testing.assert_allclose(np.asarray(Hm), np.asarray(H1), atol=1e-5)
