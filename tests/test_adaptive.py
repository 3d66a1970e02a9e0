"""Adaptive DP5(4) tracer: solver-equivalence gates.

The on-device analogue of the reference's solve_ivp-vs-diffrax comparison
(solver_comparisons.py:64-85): fixed-step RK4, slab-marching z-scan, and
adaptive RK45 must agree with each other and the scipy oracle.
"""

import jax
import numpy as np

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam, solve
from synthpy_tpu.tracer.adaptive import solve_adaptive
from synthpy_tpu.tracer.zscan import solve_zscan

from oracle import OracleTracer

EXT = 5e-3


def test_adaptive_null():
    d = ScalarDomain(2 * EXT, 21).test_null()
    s0 = init_beam(jax.random.PRNGKey(0), 32, 1e-3, 0.0, EXT, "circular")
    res = solve_adaptive(s0, d)
    rf = np.asarray(res.rf)
    np.testing.assert_allclose(rf[1], 0.0, atol=1e-10)
    np.testing.assert_allclose(rf[0], np.asarray(s0[0]), atol=1e-8)


def test_adaptive_vacuum_strides_cells():
    """The gradient-aware cap lets vacuum integrate in O(1) steps: with
    a_max = 0 the half-cell kink cap is lifted entirely and step count is
    limited only by the controller's 5x growth factor."""
    import jax.numpy as jnp

    from synthpy_tpu.constants import C
    from synthpy_tpu.fields.domain import build_pack, layout_of
    from synthpy_tpu.tracer.adaptive import trace_rk45

    d = ScalarDomain(2 * EXT, 21).test_null()
    pack = build_pack(d, 1064e-9)
    s0 = init_beam(jax.random.PRNGKey(0), 32, 1e-3, 0.0, EXT, "circular")
    t_end = jnp.asarray(np.sqrt(8.0) * EXT / C, jnp.float32)
    sf, n_acc, n_rej = trace_rk45(
        jnp.asarray(s0).T, pack.channels, pack.origin, pack.inv_spacing,
        t_end, layout=layout_of(d))
    assert int(n_acc) <= 8, int(n_acc)  # was ~29 with the flat half-cell cap
    np.testing.assert_allclose(np.asarray(sf[:, 3]), 0.0, atol=1e-6)


def test_adaptive_matches_oracle_lens():
    d = ScalarDomain(2 * EXT, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(1), 24, 1.5e-3, 0.0, EXT, "circular")
    oracle = OracleTracer(np.asarray(d.x), np.asarray(d.y), np.asarray(d.z),
                          np.asarray(d.ne))
    sf_o = oracle.solve(np.asarray(s0), EXT)
    res = solve_adaptive(s0, d, rtol=1e-6)
    sf = np.asarray(res.sf)
    # accuracy limited by the kink-blind step cap (~0.1%), not rtol
    np.testing.assert_allclose(sf[3], sf_o[3], rtol=2e-3, atol=3000.0)
    np.testing.assert_allclose(sf[:3], sf_o[:3], atol=5e-7)


def test_three_solvers_agree():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(2), 32, 1.5e-3, 1e-3, EXT, "circular")
    r_fix = solve(s0, d, steps_per_cell=8.0)
    r_ada = solve_adaptive(s0, d, rtol=1e-7)
    r_z = solve_zscan(s0, d, substeps=4)
    th_fix = np.asarray(r_fix.rf[1])
    th_ada = np.asarray(r_ada.rf[1])
    th_z = np.asarray(r_z.rf[1])
    scale = np.abs(th_z).max()
    np.testing.assert_allclose(th_ada, th_z, atol=scale * 1e-2)
    np.testing.assert_allclose(th_fix, th_z, atol=scale * 2e-2)


def test_local_amax_cap_fewer_steps_same_rays():
    """Per-plane local kink cap (VERDICT r2 item 8): on a field whose
    strong feature is LOCALIZED along the probing axis, the local cap
    steps finely only inside the feature — fewer accepted steps than the
    global cap, with unchanged exit-ray parity."""
    import numpy as np

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.adaptive import solve_adaptive

    ext = 5e-3
    n = 41
    d = ScalarDomain(2 * ext, n)
    x = np.asarray(d.x)[:, None, None]
    y = np.asarray(d.y)[None, :, None]
    z = np.asarray(d.z)[None, None, :]
    # thin filament: strong lens confined to |z| < ~LRz (vacuum elsewhere)
    LR, LRz = 1.5e-3, 0.4e-3
    d.external_ne(5e24 * np.exp(-(x**2 + y**2) / LR**2 - z**2 / LRz**2))

    s0 = init_beam(jax.random.PRNGKey(60), 64, 1.5e-3, 0.0, ext, "circular")
    res_g, (acc_g, _) = solve_adaptive(s0, d, local_cap=False,
                                       return_steps=True)
    res_l, (acc_l, _) = solve_adaptive(s0, d, local_cap=True,
                                       return_steps=True)
    # the filament occupies ~8% of the probing depth: local caps must cut
    # the step count substantially
    assert acc_l < 0.7 * acc_g, (acc_l, acc_g)
    # exit rays unchanged within the controller tolerance class
    np.testing.assert_allclose(np.asarray(res_l.rf[0]),
                               np.asarray(res_g.rf[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_l.rf[1]),
                               np.asarray(res_g.rf[1]), rtol=1e-3,
                               atol=1e-8)
