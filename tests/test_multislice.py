"""Multi-slice wave propagation: analytic and ray-tracer cross-checks.

The on-device version of the reference's diffractio cross-validation
(evaluation/c.f._diffraction): wave optics and ray optics must agree on
accumulated phase in the weak-diffraction limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.ops.multislice import (
    angular_spectrum_step,
    exit_intensity,
    multislice_propagate,
)
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import solve_zscan

EXT = 1e-3
LWL = 1064e-9


def test_vacuum_propagation_is_identity():
    d = ScalarDomain(2 * EXT, 32).test_null()
    U = multislice_propagate(d.ne, (d.x, d.y, d.z), LWL)
    np.testing.assert_allclose(np.abs(np.asarray(U)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.angle(np.asarray(U)), 0.0, atol=1e-3)


def test_uniform_slab_phase_matches_analytic():
    """Uniform n_e: exit phase = k (n-1) L exactly, amplitude 1."""
    n = 32
    d = ScalarDomain(2 * EXT, n)
    ne0 = 5e24
    d.external_ne(ne0 * np.ones((n, n, n)))
    U = np.asarray(multislice_propagate(d.ne, (d.x, d.y, d.z), LWL))
    omega = float(constants.omega_from_lwl(LWL))
    n_r = float(constants.n_refrac(jnp.array(ne0), omega))
    dz = float(d.z[1] - d.z[0])
    phi_expect = 2 * np.pi / LWL * (n_r - 1.0) * dz * (n - 1)
    # compare modulo 2 pi
    dphi = np.angle(U * np.exp(-1j * phi_expect))
    np.testing.assert_allclose(dphi, 0.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(U), 1.0, atol=1e-4)


def test_multislice_phase_matches_ray_tracer():
    """Weak lens: wave-optics exit phase == ray-traced phase integral."""
    n = 48
    d = ScalarDomain(2 * EXT, n).test_lens(ne_0=2e23, LR=0.6e-3)
    d.phaseshift = True
    U = np.asarray(multislice_propagate(d.ne, (d.x, d.y, d.z), LWL))

    # ray phases at cell-centre positions of the central row
    xs = np.asarray(d.x[8:-8])
    Np = xs.shape[0]
    s0 = np.zeros((9, Np), np.float32)
    s0[0] = xs
    s0[2] = -EXT
    s0[5] = constants.C
    s0[6] = 1.0
    res = solve_zscan(jnp.asarray(s0), d, lwl=LWL)
    phase_ray = np.asarray(res.sf[7])

    iy = n // 2
    phase_wave = np.angle(U[8:-8, iy])
    # phases stay below pi so angle() needs no unwrapping
    assert np.abs(phase_ray).max() < 2.0
    np.testing.assert_allclose(phase_wave, phase_ray, atol=0.02)


def test_angular_spectrum_energy_conservation():
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (64, 64)) + 1j * jax.random.normal(
        jax.random.PRNGKey(1), (64, 64))
    # band-limit the field so no evanescent components are clipped
    F = jnp.fft.fft2(U)
    mask = jnp.zeros((64, 64)).at[:8, :8].set(1.0)
    U = jnp.fft.ifft2(F * mask)
    U2 = angular_spectrum_step(U, 1e-3, LWL, 1e-5, 1e-5)
    e0 = float(jnp.sum(jnp.abs(U) ** 2))
    e1 = float(jnp.sum(jnp.abs(U2) ** 2))
    assert e1 == pytest.approx(e0, rel=1e-4)


def test_strong_lens_diffracts():
    """A strong phase object must redistribute intensity (|U| != 1)."""
    n = 48
    d = ScalarDomain(2 * EXT, n).test_lens(ne_0=5e25, LR=0.4e-3)
    U = np.asarray(multislice_propagate(d.ne, (d.x, d.y, d.z), LWL))
    I = exit_intensity(jnp.asarray(U))
    assert float(jnp.std(I)) > 0.01


def test_wave_vs_ray_shadowgram_geometric_limit():
    """A sinusoidal phase object imaged at distance D << Lambda^2/lambda:
    wave-optics |U|^2 and ray-density modulation must agree (the physics
    link between the two pipelines)."""
    n = 96
    ext = 1.2e-3
    Lam = 6e-4          # perturbation wavelength [m]
    ne0, eps = 5e23, 0.5
    D = 4e-3            # drift << Lam^2/lwl = 0.34 m

    d = ScalarDomain(2 * ext, n)
    X = np.asarray(d.x)[:, None, None]
    ne = ne0 * (1.0 + eps * np.cos(2 * np.pi * X / Lam))
    d.external_ne(np.broadcast_to(ne, d.dims).copy())

    # --- wave: multislice + free-space drift ---
    from synthpy_tpu.ops.multislice import angular_spectrum_step

    U = multislice_propagate(d.ne, (d.x, d.y, d.z), LWL)
    dx = float(d.x[1] - d.x[0])
    UD = angular_spectrum_step(U, D, LWL, dx, dx)
    I_wave = np.asarray(exit_intensity(UD))[:, n // 2]

    # --- rays: trace, drift D, bin along x ---
    Np = 400_000
    rng = np.random.default_rng(0)
    s0 = np.zeros((9, Np), np.float32)
    s0[0] = rng.uniform(-ext, ext, Np)
    s0[1] = rng.uniform(-ext, ext, Np)
    s0[2] = -ext
    s0[5] = constants.C
    s0[6] = 1.0
    res = solve_zscan(jnp.asarray(s0), d, lwl=LWL)
    rf = np.asarray(res.rf)
    x_drift = rf[0] + rf[1] * D  # small-angle drift
    edges = np.asarray(d.x)
    H, _ = np.histogram(x_drift, bins=edges)
    I_ray = H / H.mean()

    # compare first-harmonic modulation amplitudes at the perturbation k
    def harmonic(signal, xcoords):
        signal = signal - signal.mean()
        phase = 2 * np.pi * xcoords / Lam
        return 2 * np.abs(np.mean(signal * np.exp(-1j * phase)))

    x_mid = 0.5 * (edges[:-1] + edges[1:])
    m_ray = harmonic(I_ray, x_mid)
    m_wave = harmonic(I_wave / I_wave.mean(), np.asarray(d.x))
    assert m_ray > 0.01  # the object actually modulates
    assert m_wave == pytest.approx(m_ray, rel=0.25)
