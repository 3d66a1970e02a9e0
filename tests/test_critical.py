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


def test_run_split_mixed_bundle():
    """Localized overcritical filament: run_split routes only the rays
    that hit it onto the time tracer and matches a full-time solve."""
    n = 41
    d = ScalarDomain(2 * EXT, n)
    x = np.asarray(d.z)
    X, Y = np.meshgrid(x, x, indexing="ij")
    r2 = X**2 + Y**2
    prof = (2.0 * NC * np.exp(-r2 / (0.6e-3) ** 2)
            + 5e24 * np.exp(-r2 / (2e-3) ** 2))
    d.external_ne(np.broadcast_to(prof[:, :, None], (n, n, n)).copy())
    s0 = init_beam(jax.random.PRNGKey(7), 20000, 3e-3, 0.0, EXT, "circular")
    img_split = np.asarray(pipeline.run_split(d, s0, bins=(24, 18),
                                              pad_to=4096, seg_K=8))
    img_time = np.asarray(pipeline.run(d, s0, solver="time",
                                       critical_guard=None, bins=(24, 18)))
    assert np.isfinite(img_split).all()
    # counts agree to well under 1% (fast-set zscan vs time bin flips only)
    rel = np.abs(img_split - img_time).sum() / img_time.sum()
    assert rel < 0.01, rel


def test_run_split_subcritical_is_exact_fast_path():
    d = ScalarDomain(2 * EXT, 21, dtype=jnp.float64).test_lens(5e24, 1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(8), 4096, 1.5e-3, 0.0, EXT, "circular")
    a = np.asarray(pipeline.run_split(d, s0, bins=(16, 12), pad_to=4096,
                                      seg_K=8))
    b = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                critical_guard=None, bins=(16, 12)))
    np.testing.assert_array_equal(a, b)


def test_run_split_fully_overcritical_uses_time_path():
    d = overcritical_domain(n=31, peak=1.5, dtype=jnp.float32)
    s0 = init_beam(jax.random.PRNGKey(9), 2048, 1e-3, 0.0, EXT, "circular")
    a = np.asarray(pipeline.run_split(d, s0, bins=(16, 12), pad_to=2048))
    b = np.asarray(pipeline.run(d, s0, solver="time", critical_guard=None,
                                bins=(16, 12)))
    np.testing.assert_array_equal(a, b)


def test_run_split_warns_for_coherent():
    d = overcritical_domain(n=21, peak=1.5, dtype=jnp.float32)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(10), 1024, 1e-3, 0.0, EXT, "circular")
    with pytest.warns(UserWarning, match="solver-sensitive"):
        out = pipeline.run_split(d, s0, bins=(16, 12), pad_to=1024,
                                 diagnostic="interferometry")
    assert np.isfinite(np.asarray(out)).all()
    # cross-partition interference is now retained exactly (raw field-sum
    # accumulation + one finalize): the finalized image must be >= 0 and
    # bounded by the total coherent amplitude
    assert np.asarray(out).min() >= 0.0


def test_pipeline_guard_fallback_drops_solver_specific_kwargs():
    """The guard's fallback to solver='time' strips zscan_seg/analytic-only
    kwargs (integrator, seg_weights, ...) instead of crashing synth_image —
    exactly what the CLI/campaign surfaces always pass."""
    d = overcritical_domain(n=31, peak=1.5)
    s0 = init_beam(jax.random.PRNGKey(4), 500, 1e-3, 0.0, EXT, "circular",
                   "z", dtype=jnp.float64)
    with pytest.warns(UserWarning, match="dropping integrator, seg_weights"):
        img = pipeline.run(d, s0, solver="zscan_seg", lwl=LWL, bins=(16, 12),
                           seg_K=8, integrator="rk2", seg_weights="slab")
    assert np.all(np.isfinite(np.asarray(img)))


def test_peak_ne_over_nc_host_resident_field():
    """external_ne(host=True) fields reduce on the HOST — the guard must
    not device_put a >HBM volume for a scalar max."""
    d = overcritical_domain(n=21, peak=2.0)
    ne_host = np.asarray(d.ne)
    d2 = ScalarDomain(2 * EXT, 21, dtype=jnp.float64)
    d2.external_ne(ne_host, host=True)
    assert isinstance(d2.ne, np.ndarray)
    np.testing.assert_allclose(peak_ne_over_nc(d2, LWL), 2.0, rtol=1e-6)
    assert isinstance(d2.ne, np.ndarray)  # still host-resident
