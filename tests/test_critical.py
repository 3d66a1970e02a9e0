"""Critical-density handling: reflection physics + z-scan guard fallback.

The reference has no overcritical handling — its fast solver only clips
gradients (minimal_solver.py:222-243 ne_max) and its rays silently tunnel
or blow up. Here the general time-domain tracer reflects rays at the
ne = nc surface (the conservative ODE's energy integral puts the turning
point exactly there: v^2/2 + (c^2/2) ne/nc = c^2/2), and the z-scan entry
points detect overcritical fields and fall back to it with a warning.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants, pipeline
from synthpy_tpu.fields import ScalarDomain, peak_ne_over_nc
from synthpy_tpu.tracer import init_beam, solve

import jax

EXT = 5e-3
LWL = 1064e-9
NC = float(constants.critical_density(constants.omega_from_lwl(LWL)))


def overcritical_domain(n=61, peak=2.0, dtype=jnp.float64):
    """Gaussian barrier along z peaking at ``peak`` * nc, uniform in x, y."""
    d = ScalarDomain(2 * EXT, n, dtype=dtype)
    prof = peak * NC * np.exp(-(np.asarray(d.z) / (0.3 * EXT)) ** 2)
    ne = np.broadcast_to(prof[None, None, :], (n, n, n)).copy()
    return d.external_ne(ne)


def test_peak_ne_over_nc():
    d = overcritical_domain(n=21, peak=2.0)
    np.testing.assert_allclose(peak_ne_over_nc(d, LWL), 2.0, rtol=1e-6)
    d.ne = None
    assert peak_ne_over_nc(d, LWL) == 0.0


def test_time_tracer_reflects_at_critical_surface():
    d = overcritical_domain(n=61, peak=2.0)
    s0 = init_beam(jax.random.PRNGKey(3), 128, 1e-3, 0.0, EXT, "circular",
                   "z", dtype=jnp.float64)
    res = solve(s0, d, lwl=LWL, n_steps=4000)
    sf = np.asarray(res.sf)
    vz = sf[5]
    # every ray turned around and left the grid travelling backwards
    assert np.all(vz < -0.9 * constants.C)
    assert np.all(sf[2] < -EXT)
    # back in vacuum the energy integral restores |v| = c
    speed = np.sqrt(sf[3] ** 2 + sf[4] ** 2 + vz**2)
    np.testing.assert_allclose(speed, constants.C, rtol=1e-3)


def test_pipeline_guard_falls_back_to_time_solver():
    d = overcritical_domain(n=31, peak=1.5)
    s0 = init_beam(jax.random.PRNGKey(4), 1000, 1e-3, 0.0, EXT, "circular",
                   "z", dtype=jnp.float64)
    with pytest.warns(UserWarning, match="critical density"):
        img = pipeline.run(d, s0, solver="zscan", lwl=LWL, bins=(32, 24))
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    # reflected rays never reach the detector plane's acceptance
    with pytest.warns(UserWarning, match="critical density"):
        img2 = pipeline.run(d, s0, solver="zscan_seg", lwl=LWL,
                            bins=(32, 24), seg_K=8)
    assert np.all(np.isfinite(np.asarray(img2)))


def test_legacy_solve_guard():
    d = overcritical_domain(n=31, peak=1.5).calc_dndr(LWL)
    s0 = init_beam(jax.random.PRNGKey(5), 256, 1e-3, 0.0, EXT, "circular",
                   "z", dtype=jnp.float64)
    with pytest.warns(UserWarning, match="time-domain"):
        rf = d.solve(s0, solver="zscan")
    assert np.all(np.isfinite(np.asarray(rf)))


def test_guard_silent_below_threshold():
    d = ScalarDomain(2 * EXT, 21, dtype=jnp.float64).test_lens(1e23, 2e-3)
    s0 = init_beam(jax.random.PRNGKey(6), 500, 1e-3, 0.0, EXT, "circular",
                   "z", dtype=jnp.float64)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        img = pipeline.run(d, s0, solver="zscan", lwl=LWL, bins=(16, 12))
    assert not [w for w in rec if "critical" in str(w.message)]
    assert np.asarray(img).sum() > 0
