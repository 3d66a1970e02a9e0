"""z-scan (slab-marching) tracer: equivalence with the time-domain tracer.

The reparameterisation t -> p is exact, so exit states must agree with the
general tracer and the scipy oracle within integrator resolution.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam, solve
from synthpy_tpu.tracer.zscan import solve_zscan

from oracle import OracleTracer, ray_to_rtm

EXT = 5e-3


def test_zscan_null():
    d = ScalarDomain(2 * EXT, 21).test_null()
    s0 = init_beam(jax.random.PRNGKey(0), 64, 2e-3, 0.0, EXT, "circular")
    res = solve_zscan(s0, d)
    rf = np.asarray(res.rf)
    np.testing.assert_allclose(rf[1], 0.0, atol=1e-12)
    np.testing.assert_allclose(rf[0], np.asarray(s0[0]), atol=1e-9)


def test_zscan_matches_time_tracer_lens():
    d = ScalarDomain(2 * EXT, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(1), 64, 1.5e-3, 1e-3, EXT, "circular")
    rt = solve(s0, d, steps_per_cell=4.0, return_E=True)
    rz = solve_zscan(s0, d, substeps=4, return_E=True)
    rf_t, rf_z = np.asarray(rt.rf), np.asarray(rz.rf)
    np.testing.assert_allclose(rf_z[0], rf_t[0], atol=5e-8)
    np.testing.assert_allclose(rf_z[2], rf_t[2], atol=5e-8)
    # the time tracer is the less accurate of the two (its fixed steps
    # cross interpolation kinks mid-step; z-scan stages align with grid
    # planes), so the agreement tolerance is the TIME tracer's error level
    np.testing.assert_allclose(rf_z[1], rf_t[1], rtol=2e-2, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rz.sf[7]), np.asarray(rt.sf[7]),
                               rtol=2e-2, atol=1e-3)


def test_zscan_matches_oracle():
    d = ScalarDomain(2 * EXT, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(2), 40, 1.5e-3, 0.0, EXT, "circular")
    oracle = OracleTracer(np.asarray(d.x), np.asarray(d.y), np.asarray(d.z),
                          np.asarray(d.ne))
    sf_o = oracle.solve(np.asarray(s0), EXT)
    res = solve_zscan(s0, d, substeps=4)
    sf = np.asarray(res.sf)
    np.testing.assert_allclose(sf[0], sf_o[0] - sf_o[3]
                               * (sf_o[2] - EXT) / sf_o[5], atol=4e-7)
    # z-scan hits the f32 floor (~60 m/s on ~4e6 m/s) already at substeps=4
    np.testing.assert_allclose(sf[3], sf_o[3], rtol=1e-4, atol=80.0)


def test_zscan_all_switches_match_time_tracer():
    d = ScalarDomain(2 * EXT, 31).test_lens(ne_0=1e25, LR=2e-3)
    d.external_Te(50.0 * np.ones(d.dims))
    d.external_Z(2.0 * np.ones(d.dims))
    d.inv_brems = True
    d.phaseshift = True
    d.test_B(Bmax=10.0)
    s0 = init_beam(jax.random.PRNGKey(3), 32, 1.5e-3, 0.0, EXT, "circular")
    rt = solve(s0, d, steps_per_cell=4.0)
    rz = solve_zscan(s0, d, substeps=4)
    sf_t, sf_z = np.asarray(rt.sf), np.asarray(rz.sf)
    np.testing.assert_allclose(sf_z[6], sf_t[6], rtol=2e-2)  # amp
    np.testing.assert_allclose(sf_z[7], sf_t[7], rtol=2e-2)  # phase
    np.testing.assert_allclose(sf_z[8], sf_t[8], rtol=5e-2,
                               atol=np.abs(sf_t[8]).max() * 2e-2)  # pol


@pytest.mark.parametrize("direction", ["x", "y", "z"])
def test_zscan_probing_directions(direction):
    d = ScalarDomain(2 * EXT, 21, probing_direction=direction).test_null()
    s0 = init_beam(jax.random.PRNGKey(4), 32, 1e-3, 0.0, EXT, "circular",
                   direction)
    res = solve_zscan(s0, d)
    rf = np.asarray(res.rf)
    ref = solve(s0, d, n_steps=16)
    np.testing.assert_allclose(rf, np.asarray(ref.rf), atol=1e-9)


def test_zscan_deflecting_nonprobe_gradient():
    """Slab with x-gradient probed along z AND along x: both must agree
    with the time tracer (checks the axis permutation of channels)."""
    for direction in ("z", "x"):
        d = ScalarDomain(2 * EXT, 33, probing_direction=direction)
        d.test_slab(s=1.0, ne_0=2e23)
        s0 = init_beam(jax.random.PRNGKey(5), 32, 1e-3, 0.0, EXT, "circular",
                       direction)
        rt = solve(s0, d, steps_per_cell=3.0)
        rz = solve_zscan(s0, d, substeps=3)
        np.testing.assert_allclose(np.asarray(rz.rf[1]),
                                   np.asarray(rt.rf[1]),
                                   rtol=2e-2, atol=1e-9)


def test_zscan_ray_chunking():
    d = ScalarDomain(2 * EXT, 21).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(6), 100, 1.5e-3, 0.0, EXT, "circular")
    r_full = solve_zscan(s0, d)
    r_chunk = solve_zscan(s0, d, ray_chunk=32)
    np.testing.assert_allclose(np.asarray(r_full.sf), np.asarray(r_chunk.sf),
                               rtol=1e-6, atol=1e-9)


def test_zscan_segments_ray_chunking():
    """Segmented tracer: chunked lax.map path bit-matches the unchunked
    path across chunk boundaries (incl. a ragged final chunk)."""
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(21), 100, 1.5e-3, 0.0, EXT, "circular")
    r_full = solve_zscan_segments(s0, d, K=8)
    r_chunk = solve_zscan_segments(s0, d, K=8, ray_chunk=32)
    np.testing.assert_allclose(np.asarray(r_full.sf),
                               np.asarray(r_chunk.sf),
                               rtol=1e-6, atol=1e-9)


def test_zscan_sort_rays_same_histogram():
    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(10), 256, 1.5e-3, 0.0, EXT, "circular")
    r_plain = solve_zscan(s0, d)
    r_sorted = solve_zscan(s0, d, sort_rays=True)
    # same multiset of exit rays (compare sorted columns)
    a = np.sort(np.asarray(r_plain.sf[0]))
    b = np.sort(np.asarray(r_sorted.sf[0]))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-12)


def test_zscan_bf16_planes_close():
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import make_zscan_pack

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    zp16 = make_zscan_pack(pack, layout_of(d), "z", dtype=jnp.bfloat16)
    s0 = init_beam(jax.random.PRNGKey(11), 64, 1.5e-3, 0.0, EXT, "circular")
    r32 = solve_zscan(s0, d, pack=pack)
    r16 = solve_zscan(s0, d, zpack=zp16)
    th32 = np.asarray(r32.rf[1]); th16 = np.asarray(r16.rf[1])
    np.testing.assert_allclose(th16, th32, atol=np.abs(th32).max() * 2e-2)


def test_zscan_segments_matches_zscan():
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(12), 128, 1.5e-3, 1e-3, EXT,
                   "circular")
    r_ref = solve_zscan(s0, d)
    r_seg = solve_zscan_segments(s0, d, K=8)  # 32 slabs -> 4 segments
    sf_r, sf_s = np.asarray(r_ref.sf), np.asarray(r_seg.sf)
    # paraxial rays stay within their corner patch: results nearly identical
    np.testing.assert_allclose(sf_s[0], sf_r[0], atol=6e-8)
    # the worst ray is one that crosses a cell boundary mid-segment
    # (frozen-corner clamping) — bounded at ~1e-3 of the velocity scale
    np.testing.assert_allclose(sf_s[3], sf_r[3], rtol=1e-3,
                               atol=np.abs(sf_r[3]).max() * 1.5e-3)
    np.testing.assert_allclose(sf_s[7], sf_r[7], rtol=5e-3,
                               atol=np.abs(sf_r[7]).max() * 5e-3)


def test_zscan_segments_padding_exact():
    """n_slabs not divisible by K: zero-padded planes must be exact."""
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 22).test_null()  # 21 slabs, K=8 -> pad to 24
    s0 = init_beam(jax.random.PRNGKey(13), 32, 1e-3, 1e-3, EXT, "circular")
    r = solve_zscan_segments(s0, d, K=8)
    rf = np.asarray(r.rf)
    ref = np.asarray(solve_zscan(s0, d).rf)
    np.testing.assert_allclose(rf, ref, atol=1e-9)


def test_zscan_segments_all_switches():
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=1e25, LR=2e-3)
    d.external_Te(50.0 * np.ones(d.dims))
    d.external_Z(2.0 * np.ones(d.dims))
    d.inv_brems = True
    d.phaseshift = True
    d.test_B(Bmax=10.0)
    s0 = init_beam(jax.random.PRNGKey(14), 32, 1.5e-3, 0.0, EXT, "circular")
    r_ref = solve_zscan(s0, d)
    r_seg = solve_zscan_segments(s0, d, K=6)
    for row, tol in ((6, 2e-3), (7, 2e-3), (8, 5e-3)):
        a, b = np.asarray(r_seg.sf[row]), np.asarray(r_ref.sf[row])
        np.testing.assert_allclose(a, b, rtol=tol,
                                   atol=np.abs(b).max() * tol + 1e-12)


def test_zscan_segments_bf16():
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (make_segment_pack, make_zscan_pack,
                                          solve_zscan_segments)

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    zp16 = make_zscan_pack(pack, layout_of(d), "z", dtype=jnp.bfloat16)
    sp16 = make_segment_pack(zp16, K=8)
    s0 = init_beam(jax.random.PRNGKey(15), 64, 1.5e-3, 0.0, EXT, "circular")
    r32 = solve_zscan(s0, d, pack=pack)
    r16 = solve_zscan_segments(s0, d, spack=sp16)
    th32 = np.asarray(r32.rf[1]); th16 = np.asarray(r16.rf[1])
    np.testing.assert_allclose(th16, th32, atol=np.abs(th32).max() * 2e-2)


def test_streaming_segment_pack_matches_monolithic():
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                          make_segment_pack, make_zscan_pack)

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    mono = make_segment_pack(
        make_zscan_pack(build_pack(d), layout_of(d)), K=8)
    stream = build_segment_pack_streaming(d, K=8, dtype=jnp.float32)
    assert stream.seg_planes.shape == mono.seg_planes.shape
    a = np.asarray(stream.seg_planes)
    b = np.asarray(mono.seg_planes)
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=scale * 1e-6)
    assert stream.K == mono.K and stream.n_slabs == mono.n_slabs
    np.testing.assert_allclose(np.asarray(stream.origin_ab),
                               np.asarray(mono.origin_ab))


@pytest.mark.parametrize("direction", ["x", "y"])
def test_zscan_segments_probing_directions(direction):
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 25, probing_direction=direction)
    d.test_slab(s=1.0, ne_0=2e23)
    s0 = init_beam(jax.random.PRNGKey(16), 32, 1e-3, 0.0, EXT, "circular",
                   direction)
    r_seg = solve_zscan_segments(s0, d, K=8)
    r_ref = solve_zscan(s0, d)
    np.testing.assert_allclose(np.asarray(r_seg.rf), np.asarray(r_ref.rf),
                               rtol=1e-4, atol=1e-10)


def test_device_segment_pack_matches_monolithic():
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          make_segment_pack, make_zscan_pack)

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    mono = make_segment_pack(
        make_zscan_pack(build_pack(d), layout_of(d)), K=8)
    dev = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    assert dev.seg_planes.shape == mono.seg_planes.shape
    a = np.asarray(dev.seg_planes)
    b = np.asarray(mono.seg_planes)
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=scale * 1e-6)


def test_device_segment_pack_nondivisible():
    """n_slabs not divisible by K: the last real plane sits mid-segment."""
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          make_segment_pack, make_zscan_pack)

    d = ScalarDomain(2 * EXT, 22).test_lens(ne_0=5e24, LR=1.5e-3)  # 21 slabs
    mono = make_segment_pack(
        make_zscan_pack(build_pack(d), layout_of(d)), K=8)
    dev = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    a = np.asarray(dev.seg_planes)
    b = np.asarray(mono.seg_planes)
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=scale * 1e-6)


def test_zscan_f64_oracle_parity_1e7():
    """SURVEY gate: solver equivalence below the reference's 1e-7 threshold
    (solver_comparisons.py:82-85) — f64 z-scan vs adaptive scipy oracle."""
    with jax.enable_x64(True):
        d = ScalarDomain(2 * EXT, 41, dtype=jnp.float64).test_lens(
            ne_0=5e24, LR=1.5e-3)
        s0 = init_beam(jax.random.PRNGKey(2), 24, 1.5e-3, 0.0, EXT,
                       "circular", dtype=jnp.float64)
        oracle = OracleTracer(np.asarray(d.x), np.asarray(d.y),
                              np.asarray(d.z), np.asarray(d.ne))
        sf_o = oracle.solve(np.asarray(s0), EXT)
        res = solve_zscan(s0, d, substeps=4)
        sf = np.asarray(res.sf)
        rf = np.asarray(res.rf)
    vscale = np.abs(sf_o[3]).max()
    assert np.abs(sf[3] - sf_o[3]).max() / vscale < 1e-7
    # exit-plane positions (the states sit on different planes; compare
    # the back-projected exit rays)
    rf_o = ray_to_rtm(sf_o, EXT)
    assert np.abs(rf[0] - rf_o[0]).max() < 1e-10
    assert np.abs(rf[1] - rf_o[1]).max() < 1e-9


def test_lens_deflection_matches_paraxial_analytic():
    """Gaussian-column lens: theta_x = ext * (2x/LR^2) * (ne0/nc) e^{-r^2/LR^2}
    in the paraxial weak-deflection limit (independent of the oracle)."""
    from synthpy_tpu import constants

    ne0, LR = 1e23, 1.5e-3  # weak lens
    d = ScalarDomain(2 * EXT, 81).test_lens(ne_0=ne0, LR=LR)
    xs = np.linspace(-1.2e-3, 1.2e-3, 9).astype(np.float32)
    Np = xs.shape[0]
    s0 = np.zeros((9, Np), np.float32)
    s0[0] = xs
    s0[2] = -EXT
    s0[5] = constants.C
    s0[6] = 1.0
    res = solve_zscan(jnp.asarray(s0), d, substeps=2)
    theta = np.asarray(res.rf[1])
    omega = float(constants.omega_from_lwl(1064e-9))
    nc = float(constants.critical_density(omega))
    expect = EXT * (2 * xs / LR**2) * (ne0 / nc) * np.exp(-xs**2 / LR**2)
    np.testing.assert_allclose(theta, expect, rtol=2e-2,
                               atol=np.abs(expect).max() * 1e-3)


def test_zscan_segments_full_K_image_equivalence():
    """K = n_slabs (corners frozen for the whole trace): detector images
    must match the exact tracer to sub-pixel accuracy."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          make_segment_pack, make_zscan_pack)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(17), 8192, 2e-3, 0.0, EXT, "circular")
    H_ref = np.asarray(pipeline.run(d, s0, solver="zscan", bins=(54, 40)))
    sp = build_segment_pack_device(d, K=32, dtype=jnp.bfloat16)
    H_fast = np.asarray(pipeline.run(d, s0, solver="zscan_seg", spack=sp,
                                     bins=(54, 40)))
    assert H_fast.sum() == H_ref.sum()
    # <2% of rays land in a different (adjacent) pixel
    assert np.abs(H_fast - H_ref).sum() < 0.04 * H_ref.sum()


def test_pipeline_run_auto_batches_oversized_packs():
    """When the segment pack exceeds the batching threshold, pipeline.run
    splits the bundle into same-shape per-call batches (padded with
    off-grid rays) and sums the images — the 1024^3-at-the-API-surface
    path, exercised here with tiny thresholds."""
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    d = ScalarDomain(2 * ext, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(30), 3000, 2e-3, 0.0, ext, "circular")

    ref = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                  bins=(54, 40)))
    # force batching: pack "exceeds" 1 byte and the corner budget floors
    # max_rays at 1024 -> 3 padded batches of 1024 rays each
    out = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                  bins=(54, 40), batch_pack_bytes=1,
                                  batch_corner_bytes=1))
    assert out.sum() == ref.sum()
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    # multi-diagnostic batching accumulates every image
    d.phaseshift = True
    outs = pipeline.run(d, s0, solver="zscan_seg", seg_K=8, bins=(30, 22),
                        diagnostic=("shadowgraphy", "interferometry"),
                        batch_pack_bytes=1, batch_corner_bytes=1)
    refs = pipeline.run(d, s0, solver="zscan_seg", seg_K=8, bins=(30, 22),
                        diagnostic=("shadowgraphy", "interferometry"))
    np.testing.assert_allclose(np.asarray(outs["shadowgraphy"]),
                               np.asarray(refs["shadowgraphy"]),
                               rtol=1e-6, atol=1e-6)
    # coherent batching accumulates RAW per-pixel field sums and
    # finalizes once, so cross-batch interference is EXACT (vs the
    # reference's per-rank amplitude-image MPI reduce,
    # interference_MPI.py:190-204)
    np.testing.assert_allclose(np.asarray(outs["interferometry"]),
                               np.asarray(refs["interferometry"]),
                               rtol=1e-5, atol=1e-5
                               * np.abs(refs["interferometry"]).max())


def test_batched_coherent_exact_vs_single_program():
    """VERDICT r2 item 5 gate: a batched interferogram (>= 4 batches)
    equals the single-program interferogram to fp tolerance, with no
    cross-batch-interference warning."""
    import warnings

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    d = ScalarDomain(2 * ext, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(33), 4100, 2e-3, 0.0, ext,
                   "circular")  # 5 padded batches of 1024

    for conv in ("legacy", "intensity"):
        ref = np.asarray(pipeline.run(
            d, s0, solver="zscan_seg", seg_K=8, bins=(30, 22),
            diagnostic="interferometry", coherent_convention=conv))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = np.asarray(pipeline.run(
                d, s0, solver="zscan_seg", seg_K=8, bins=(30, 22),
                diagnostic="interferometry", coherent_convention=conv,
                batch_pack_bytes=1, batch_corner_bytes=1))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=scale * 1e-5)

    # coherent_raw=True surfaces the raw accumulator for campaign use:
    # summed accumulators + one finalize == single program
    acc = None
    for i0 in range(0, 4096, 1024):
        a = pipeline.run(d, s0[:, i0:i0 + 1024], solver="zscan_seg",
                         seg_K=8, bins=(30, 22),
                         diagnostic="interferometry", coherent_raw=True)
        acc = a if acc is None else acc + a
    img = np.asarray(pipeline.finalize_coherent(acc, "interferometry"))
    ref4096 = np.asarray(pipeline.run(
        d, s0[:, :4096], solver="zscan_seg", seg_K=8, bins=(30, 22),
        diagnostic="interferometry"))
    np.testing.assert_allclose(img, ref4096,
                               atol=np.abs(ref4096).max() * 1e-5)


def test_zscan_segments_blocked_matches_unblocked():
    """block=Kb mode: identical arithmetic (same frozen corners, same
    stage fractions) -> images and exit states match the per-slab scan
    to float tolerance."""
    import numpy as np

    from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import (make_segment_pack,
                                          make_zscan_pack,
                                          trace_zscan_segments)

    ext = 5e-3
    d = ScalarDomain(2 * ext, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    lay = layout_of(d)
    sp = make_segment_pack(make_zscan_pack(build_pack(d), lay), K=16)
    s0 = init_beam(jax.random.PRNGKey(40), 512, 2e-3, 1e-3, ext,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)
    kwargs = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
                  n_seg=sp.seg_planes.shape[0])

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp, **kwargs))
    for blk in (2, 4, 8):
        out = np.asarray(trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
            block=blk, **kwargs))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7,
                                   err_msg=f"block={blk}")
    # non-dividing block falls back to the per-slab path
    out = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        block=5, **kwargs))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_zscan_segments_rk2_matches_rk4_and_oracle():
    """integrator="rk2" (midpoint): the blended field is piecewise-linear
    along p, so midpoint sampling loses almost nothing at 1 step/cell —
    exit states match rk4 to ~1e-5 relative and the scipy oracle to the
    same tolerance class as rk4 (reference accuracy gate:
    solver_comparisons.py:82-85)."""
    import numpy as np

    from oracle import OracleTracer
    from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import (make_segment_pack,
                                          make_zscan_pack,
                                          solve_zscan_segments)

    ext = 5e-3
    d = ScalarDomain(2 * ext, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(7), 48, 1.5e-3, 0.0, ext, "circular")

    r4 = solve_zscan_segments(s0, d, K=8)
    r2 = solve_zscan_segments(s0, d, K=8, integrator="rk2")
    sf4, sf2 = np.asarray(r4.sf), np.asarray(r2.sf)
    np.testing.assert_allclose(sf2[0], sf4[0], atol=2e-8)       # position
    np.testing.assert_allclose(sf2[3], sf4[3], rtol=5e-5,
                               atol=150.0)                      # velocity

    oracle = OracleTracer(np.asarray(d.x), np.asarray(d.y), np.asarray(d.z),
                          np.asarray(d.ne))
    sf_o = oracle.solve(np.asarray(s0), ext)
    np.testing.assert_allclose(
        sf2[0], sf_o[0] - sf_o[3] * (sf_o[2] - ext) / sf_o[5], atol=1e-6)
    np.testing.assert_allclose(sf2[3], sf_o[3], rtol=2e-3, atol=300.0)


def test_pipeline_rk2_image_close_to_rk4():
    """integrator="rk2" through pipeline.run: same detector sum, <2% of
    rays land in a different (adjacent) pixel vs rk4."""
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    d = ScalarDomain(2 * ext, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(11), 4000, 2e-3, 0.0, ext, "circular")
    H4 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(54, 40)))
    H2 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(54, 40), integrator="rk2"))
    assert H2.sum() == H4.sum()
    assert np.abs(H2 - H4).sum() < 0.04 * H4.sum()


def test_rk2_guard_rejects_unsupported_modes():
    """integrator='rk2' raises instead of silently tracing rk4 when
    combined with substeps>1, block=, the non-segmented path, or a
    non-zscan_seg solver."""
    import numpy as np
    import pytest as _pytest

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import (make_segment_pack,
                                          make_zscan_pack,
                                          trace_zscan_segments)

    ext = 5e-3
    d = ScalarDomain(2 * ext, 17).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    sp = make_segment_pack(make_zscan_pack(build_pack(d), lay), K=8)
    s = jnp.asarray(init_beam(jax.random.PRNGKey(1), 32, 2e-3, 0.0, ext,
                              "circular"))
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    kw = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
              n_seg=sp.seg_planes.shape[0])
    dp = jnp.float32(sp.dp)
    with _pytest.raises(ValueError, match="rk2"):
        trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                             sp.inv_spacing_ab, dp, integrator="rk2",
                             substeps=2, **kw)
    with _pytest.raises(ValueError, match="rk2"):
        trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                             sp.inv_spacing_ab, dp, integrator="rk2",
                             block=4, **kw)
    with _pytest.raises(ValueError, match="unknown integrator"):
        trace_zscan_segments(u, sp.seg_planes, sp.origin_ab,
                             sp.inv_spacing_ab, dp, integrator="euler",
                             **kw)
    s0 = np.asarray(s)
    with _pytest.raises(ValueError, match="segmented"):
        pipeline.run(d, s0, solver="zscan", integrator="rk2",
                     bins=(20, 16))


def test_shadowgraphy_exp_detL_reaches_the_bench():
    """pipeline.run(diagnostic='shadowgraphy_exp', detL=...) changes the
    detector arm (the legacy single_exp_solve parameter,
    rtm_solver.py:216-222) instead of freezing it at 400 mm."""
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    d = ScalarDomain(2 * ext, 21).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(2), 2000, 2e-3, 0.0, ext, "circular")
    H_400 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                    diagnostic="shadowgraphy_exp",
                                    bins=(40, 30)))
    H_800 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                    diagnostic="shadowgraphy_exp",
                                    bins=(40, 30), detL=800.0))
    H_def = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                    diagnostic="shadowgraphy_exp",
                                    bins=(40, 30), detL=400.0))
    np.testing.assert_allclose(H_def, H_400)
    assert np.abs(H_800 - H_400).sum() > 0


@pytest.mark.parametrize("direction", ["x", "y", "z"])
def test_rk2_matches_rk4_all_probing_directions(direction):
    """rk2 == rk4 (to f32 tolerance) for every probing direction."""
    import numpy as np

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    ext = 5e-3
    d = ScalarDomain(2 * ext, 25, probing_direction=direction)
    d.test_lens(ne_0=5e24, LR=1.5e-3) if direction == "z" else \
        d.test_liner(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(21), 64, 2e-3, 0.0, ext, "circular",
                   direction)
    r4 = np.asarray(solve_zscan_segments(s0, d, K=8).sf)
    r2 = np.asarray(solve_zscan_segments(s0, d, K=8, integrator="rk2").sf)
    np.testing.assert_allclose(r2[:3], r4[:3], atol=5e-8)
    np.testing.assert_allclose(r2[3:6], r4[3:6], rtol=1e-4, atol=200.0)


def test_rk2_non_cubic_grid():
    """rk2 on a rectangular (non-cubic) grid matches rk4 — the per-axis
    coordinate design (no NaN padding) holds for both integrators."""
    import numpy as np

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    ext = 5e-3
    d = ScalarDomain((2 * ext, 1.5 * ext, 2.5 * ext), (21, 17, 29))
    d.test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(22), 64, 1e-3, 0.0, d.extent,
                   "circular")
    r4 = np.asarray(solve_zscan_segments(s0, d, K=4).sf)
    r2 = np.asarray(solve_zscan_segments(s0, d, K=4, integrator="rk2").sf)
    assert np.isfinite(r2).all()
    np.testing.assert_allclose(r2[:3], r4[:3], atol=5e-8)
    np.testing.assert_allclose(r2[3:6], r4[3:6], rtol=1e-4, atol=200.0)


def test_rk2s2_matches_rk4_and_images():
    """integrator='rk2s2' (stride-2 midpoint: h=2*dp, the midpoint plane
    read directly from the pack, no z-blends): exit states match rk4 to
    the f32 tolerance class for even and odd K, and the shadowgram is
    detector-identical (<1% adjacent-pixel moves) on a turbulent field."""
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    ext = 5e-3
    d = ScalarDomain(2 * ext, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(31), 64, 1.5e-3, 0.0, ext, "circular")
    rf4 = np.asarray(solve_zscan_segments(s0, d, K=8).rf)
    for K in (8, 9):   # even and odd (odd exercises the trailing step)
        rfs = np.asarray(solve_zscan_segments(
            s0, d, K=K, integrator="rk2s2").rf)
        np.testing.assert_allclose(rfs[0], rf4[0], atol=5e-7,
                                   err_msg=f"K={K}")
        np.testing.assert_allclose(rfs[1], rf4[1], atol=2e-5,
                                   err_msg=f"K={K}")

    H4 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(40, 30)))
    Hs = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(40, 30), integrator="rk2s2"))
    assert Hs.sum() == H4.sum()
    assert np.abs(Hs - H4).sum() <= 0.02 * H4.sum()


def _full_physics_domain(dims=25):
    """Domain with every physics switch on (kappa, phase, Faraday)."""
    d = ScalarDomain(2 * EXT, dims).test_lens(ne_0=1e25, LR=2e-3)
    d.external_Te(50.0 * np.ones(d.dims))
    d.external_Z(2.0 * np.ones(d.dims))
    d.inv_brems = True
    d.phaseshift = True
    d.test_B(Bmax=10.0)
    return d


def _assert_packs_close_per_channel(a_pack, b_pack, K, rtol=1e-6):
    """Compare seg_planes channel by channel (channels span ~15 orders of
    magnitude, so one global atol would mask real kappa/Faraday errors)."""
    a = np.asarray(a_pack.seg_planes)
    b = np.asarray(b_pack.seg_planes)
    assert a.shape == b.shape
    C = a.shape[-1] // (K + 1)
    a = a.reshape(*a.shape[:-1], K + 1, C)
    b = b.reshape(*b.shape[:-1], K + 1, C)
    for c in range(C):
        scale = np.abs(b[..., c]).max()
        np.testing.assert_allclose(a[..., c], b[..., c],
                                   atol=max(scale, 1e-30) * rtol,
                                   err_msg=f"channel {c}")


def test_device_segment_pack_full_physics():
    """Scale-class device builder supports inv_brems + phase + B channels
    (VERDICT r2 item 3: the NotImplementedError is gone) and matches the
    monolithic builder channel-for-channel."""
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          make_segment_pack, make_zscan_pack)

    d = _full_physics_domain()
    mono = make_segment_pack(
        make_zscan_pack(build_pack(d), layout_of(d)), K=8)
    dev = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    _assert_packs_close_per_channel(dev, mono, K=8)


def test_streaming_segment_pack_full_physics():
    """Host-assembling streaming builder: full channels, host inputs."""
    from synthpy_tpu.fields import build_pack, layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                          make_segment_pack, make_zscan_pack)

    d = _full_physics_domain()
    mono = make_segment_pack(
        make_zscan_pack(build_pack(d), layout_of(d)), K=8)
    stream = build_segment_pack_streaming(d, K=8, dtype=jnp.float32)
    _assert_packs_close_per_channel(stream, mono, K=8)


def test_full_physics_scale_builders_trace():
    """End-to-end: device-built full-physics pack drives the segmented
    march and matches the time tracer on amp/phase/pol."""
    from synthpy_tpu.tracer import solve
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          solve_zscan_segments)

    d = _full_physics_domain(31)
    sp = build_segment_pack_device(d, K=10, dtype=jnp.float32)
    s0 = init_beam(jax.random.PRNGKey(40), 32, 1.5e-3, 0.0, EXT, "circular")
    rt = solve(s0, d, steps_per_cell=4.0)
    rz = solve_zscan_segments(s0, d, spack=sp)
    sf_t, sf_z = np.asarray(rt.sf), np.asarray(rz.sf)
    np.testing.assert_allclose(sf_z[6], sf_t[6], rtol=2e-2)  # amp
    np.testing.assert_allclose(sf_z[7], sf_t[7], rtol=2e-2)  # phase
    np.testing.assert_allclose(sf_z[8], sf_t[8], rtol=5e-2,
                               atol=np.abs(sf_t[8]).max() * 2e-2)  # pol


def test_streamed_march_bit_identical():
    """Host-pack streamed march (segment-by-segment upload) is
    BIT-identical to the in-memory segmented tracer — same march_segment
    arithmetic, only the residency of the pack differs."""
    from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                          solve_zscan_segments,
                                          solve_zscan_segments_streamed)

    d = _full_physics_domain()
    sp_dev = build_segment_pack_streaming(d, K=8, dtype=jnp.float32)
    sp_host = build_segment_pack_streaming(d, K=8, dtype=jnp.float32,
                                           device=False)
    assert isinstance(sp_host.seg_planes, np.ndarray)
    s0 = init_beam(jax.random.PRNGKey(41), 64, 1.5e-3, 1e-3, EXT,
                   "circular")
    for integ in ("rk4", "rk2s2"):
        ref = solve_zscan_segments(s0, d, spack=sp_dev, integrator=integ)
        out = solve_zscan_segments_streamed(s0, d, hpack=sp_host,
                                            integrator=integ)
        np.testing.assert_allclose(np.asarray(out.sf), np.asarray(ref.sf),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(out.rf), np.asarray(ref.rf),
                                   rtol=0, atol=0)


def test_streamed_march_device_cache():
    """A DeviceSegmentCache (partial and full residency) gives
    bit-identical results to uncached streaming, and a cache built for a
    different pack is rejected."""
    import pytest
    from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                          make_device_segment_cache,
                                          solve_zscan_segments_streamed)

    d = _full_physics_domain()
    sp_host = build_segment_pack_streaming(d, K=8, dtype=jnp.float32,
                                           device=False)
    s0 = init_beam(jax.random.PRNGKey(43), 64, 1.5e-3, 1e-3, EXT,
                   "circular")
    ref = solve_zscan_segments_streamed(s0, d, hpack=sp_host)

    seg_bytes = sp_host.seg_planes[0].nbytes
    n_seg = sp_host.seg_planes.shape[0]
    assert n_seg >= 2
    # partial residency (half the segments), then full residency
    for budget in (seg_bytes * (n_seg // 2), seg_bytes * n_seg):
        cache = make_device_segment_cache(sp_host, budget_bytes=budget)
        out = solve_zscan_segments_streamed(s0, d, hpack=sp_host,
                                            cache=cache)
        np.testing.assert_allclose(np.asarray(out.sf), np.asarray(ref.sf),
                                   rtol=0, atol=0)
    assert len(cache.resident) == n_seg

    other = build_segment_pack_streaming(d, K=8, dtype=jnp.float32,
                                         device=False)
    stale = make_device_segment_cache(other, budget_bytes=seg_bytes)
    with pytest.raises(ValueError, match="different pack"):
        solve_zscan_segments_streamed(s0, d, hpack=sp_host, cache=stale)


def test_streamed_march_ray_chunking():
    from synthpy_tpu.tracer.zscan import (build_segment_pack_streaming,
                                          solve_zscan_segments_streamed)

    d = ScalarDomain(2 * EXT, 17).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_host = build_segment_pack_streaming(d, K=8, dtype=jnp.float32,
                                           device=False)
    s0 = init_beam(jax.random.PRNGKey(42), 100, 1.5e-3, 0.0, EXT,
                   "circular")
    ref = solve_zscan_segments_streamed(s0, d, hpack=sp_host)
    out = solve_zscan_segments_streamed(s0, d, hpack=sp_host, ray_chunk=32)
    np.testing.assert_allclose(np.asarray(out.sf), np.asarray(ref.sf),
                               rtol=1e-7, atol=1e-12)


def test_pipeline_run_host_pack_streams():
    """pipeline.run accepts a host-resident SegmentPack and streams it
    (the >HBM single-chip surface), matching the device-pack image."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import build_segment_pack_streaming

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_host = build_segment_pack_streaming(d, K=8, dtype=jnp.float32,
                                           device=False)
    s0 = init_beam(jax.random.PRNGKey(43), 1500, 2e-3, 0.0, EXT, "circular")
    ref = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                  bins=(54, 40)))
    out = np.asarray(pipeline.run(d, s0, solver="zscan_seg", spack=sp_host,
                                  bins=(54, 40)))
    assert out.sum() == ref.sum()
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_weights_slab_mode_image_equivalent():
    """weights='slab' (per-slab transverse weights + folded mask) is a
    fast mode: exit rays within the frozen-corner tolerance class of the
    strict per-stage march, detector images equal at sub-pixel level."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(50), 4096, 2e-3, 1e-3, EXT,
                   "circular")
    for integ in ("rk4", "rk2s2"):
        ref = np.asarray(solve_zscan_segments(
            s0, d, K=8, integrator=integ).sf)
        out = np.asarray(solve_zscan_segments(
            s0, d, K=8, integrator=integ, weights="slab").sf)
        # positions to sub-cell accuracy, velocities to the same class as
        # the frozen-corner clamp
        np.testing.assert_allclose(out[0], ref[0], atol=5e-7)
        np.testing.assert_allclose(out[3], ref[3], rtol=2e-3,
                                   atol=np.abs(ref[3]).max() * 2e-3)

    H = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                bins=(54, 40)))
    Hs = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(54, 40), seg_weights="slab"))
    assert Hs.sum() == H.sum()
    assert np.abs(Hs - H).sum() <= 0.01 * H.sum()


def test_rk2s4_images_close():
    """rk2s4 (stride-4 midpoint) exit rays within the coarse-tier
    tolerance of rk4, detector images close at the percent level, and
    the K%4 remainder path exact."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import solve_zscan_segments

    d = ScalarDomain(2 * EXT, 41).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(70), 4096, 2e-3, 0.0, EXT,
                   "circular")
    rf4 = np.asarray(solve_zscan_segments(s0, d, K=8).rf)
    for K in (8, 10, 11):   # K%4 = 0, 2, 3 (remainder slabs exercised)
        rfs = np.asarray(solve_zscan_segments(
            s0, d, K=K, integrator="rk2s4").rf)
        np.testing.assert_allclose(rfs[0], rf4[0], atol=2e-6,
                                   err_msg=f"K={K}")
        # coarse tier: 4-cell steps on this 40-slab test grid leave
        # ~1-2% angle truncation (on 512-slab production grids the same
        # stride is sub-0.1%); the detector-image check below is the
        # tier's accuracy gate
        np.testing.assert_allclose(rfs[1], rf4[1], rtol=0.03, atol=3e-6,
                                   err_msg=f"K={K}")

    H4 = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(40, 30)))
    Hs = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                 bins=(40, 30), integrator="rk2s4"))
    assert Hs.sum() == H4.sum()
    assert np.abs(Hs - H4).sum() <= 0.05 * H4.sum()

def test_int8_pack_matches_float_pack():
    """int8 quantised packs (per-(segment, plane, channel) scales): exit
    rays within the quantisation tolerance class of the f32 pack and
    detector images equal at the percent level, for every integrator
    tier and both weights modes. Rationale: the march is gather-bound
    (DESIGN.md step 6) and int8 halves the bytes/ray — measured 1.24x at
    512^3 production shape (scratch/bench_int8_prod.py)."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          solve_zscan_segments)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    sp_q = build_segment_pack_device(d, K=8, dtype=jnp.int8)
    assert sp_q.seg_planes.dtype == jnp.int8
    assert sp_q.scales.shape == (sp_q.seg_planes.shape[0], 9,
                                 sp_f.seg_planes.shape[-1] // 9)
    s0 = init_beam(jax.random.PRNGKey(90), 4096, 2e-3, 1e-3, EXT,
                   "circular")
    for integ in ("rk4", "rk2", "rk2s2", "rk2s4"):
        for w in ("stage", "slab"):
            ref = np.asarray(solve_zscan_segments(
                s0, d, spack=sp_f, integrator=integ, weights=w).sf)
            out = np.asarray(solve_zscan_segments(
                s0, d, spack=sp_q, integrator=integ, weights=w).sf)
            # positions: quantisation of the acceleration field perturbs
            # exit positions at the sub-cell level (cell = 3e-4 m here)
            np.testing.assert_allclose(out[0], ref[0], atol=3e-6,
                                       err_msg=f"{integ}/{w}")
            np.testing.assert_allclose(
                out[3], ref[3], rtol=2e-2,
                atol=np.abs(ref[3]).max() * 2e-2, err_msg=f"{integ}/{w}")

    H = np.asarray(pipeline.run(d, s0, spack=sp_f, solver="zscan_seg",
                                bins=(54, 40)))
    Hq = np.asarray(pipeline.run(d, s0, spack=sp_q, solver="zscan_seg",
                                 bins=(54, 40)))
    assert Hq.sum() == H.sum()
    assert np.abs(Hq - H).sum() <= 0.03 * H.sum()


def test_quantize_segment_pack_round_trip_and_guards():
    """quantize_segment_pack: dequantised cells within one scale step of
    the float pack; int8 packs rejected on the unsupported paths."""
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          build_segment_pack_streaming,
                                          march_segment,
                                          quantize_segment_pack)

    d = ScalarDomain(2 * EXT, 17).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    sp_q = quantize_segment_pack(sp_f)
    assert sp_q.seg_planes.dtype == jnp.int8
    # idempotent
    assert quantize_segment_pack(sp_q) is sp_q
    n_seg, cells, cols = sp_f.seg_planes.shape
    C = cols // 9
    v = np.asarray(sp_f.seg_planes).reshape(n_seg, cells, 9, C)
    deq = (np.asarray(sp_q.seg_planes).reshape(n_seg, cells, 9, C)
           * np.asarray(sp_q.scales)[:, None])
    err = np.abs(deq - v)
    assert (err <= 0.5 * np.asarray(sp_q.scales)[:, None] + 1e-12).all()

    # guards: quantised tables are per-slab fast-path only
    u = jnp.zeros((16, 8))
    with pytest.raises(ValueError, match="int8"):
        march_segment(u, sp_q.seg_planes[0], sp_q.origin_ab,
                      sp_q.inv_spacing_ab, sp_q.dp,
                      shape_ab=sp_q.shape_ab,
                      layout=__import__("synthpy_tpu.fields.domain",
                                        fromlist=["layout_of"]
                                        ).layout_of(d),
                      K=sp_q.K, C=C, substeps=2,
                      scales=sp_q.scales[0])
    # int8 STREAMING packs are supported since the streamed >HBM path
    # gained quantisation (half the H2D bytes): device=True uploads the
    # host-assembled table, device=False keeps it host-resident
    sp_s = build_segment_pack_streaming(d, K=8, dtype=jnp.int8,
                                        plane_batch=5)
    assert sp_s.seg_planes.dtype == jnp.int8 and sp_s.scales is not None

def test_streamed_int8_pack_matches_device_and_march():
    """int8 on the STREAMED path: the host streaming builder's quantised
    tables equal the device builder's (same per-plane scale semantics,
    boundary one-sided planes requantised), and the segment-streamed
    march is bit-identical to the in-memory int8 march. Full physics
    channels on; halves the H2D bytes of the >HBM 1024^3 path."""
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          build_segment_pack_streaming,
                                          solve_zscan_segments,
                                          solve_zscan_segments_streamed)

    d = ScalarDomain(2 * EXT, 21).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    d.inv_brems = True
    d.external_Te(200.0 * jnp.ones((21, 21, 21)))
    d.external_Z(2.0 * jnp.ones((21, 21, 21)))

    sp_dev = build_segment_pack_device(d, K=8, dtype=jnp.int8)
    sp_str = build_segment_pack_streaming(d, K=8, dtype=jnp.int8,
                                          plane_batch=5, device=False)
    assert isinstance(sp_str.seg_planes, np.ndarray)
    assert sp_str.seg_planes.dtype == np.int8
    np.testing.assert_array_equal(sp_str.seg_planes,
                                  np.asarray(sp_dev.seg_planes))
    np.testing.assert_allclose(np.asarray(sp_str.scales),
                               np.asarray(sp_dev.scales), rtol=1e-6)

    s0 = init_beam(jax.random.PRNGKey(21), 2048, 2e-3, 1e-3, EXT,
                   "circular")
    ref = np.asarray(solve_zscan_segments(
        s0, d, spack=sp_dev, integrator="rk2s2").sf)
    out = np.asarray(solve_zscan_segments_streamed(
        s0, d, hpack=sp_str, integrator="rk2s2").sf)
    np.testing.assert_array_equal(out, ref)


def test_int4_pack_decode_exact_and_images_close():
    """int4 nibble packs: the packed bytes decode EXACTLY to the
    symmetric [-7, 7] quantisation of the float pack (low nibble =
    plane 2j, high = 2j+1, sign-extended), the device builder and the
    standalone quantizer agree bit-for-bit, and the even-stride
    integrators produce images at the int8-class error level on
    extended fields. Rationale: the march is GATHER-bound; int4
    quarters the bytes/ray vs bf16 — measured 8.69 M rays/s rk2s4 at
    512^3 on v5e (scratch/bench_int4.py), with turbulent-field image
    rel-L1 5% raw / 0.7% at 1-px detector PSF vs the f32 pack
    (scratch/int4_error_512.py; the lens CAUSTIC at 512^3 is the
    documented worst case — sub-cell ray displacement but caustic
    pixel reshuffling)."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          quantize_segment_pack,
                                          solve_zscan_segments)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    sp_4 = quantize_segment_pack(sp_f, bits=4)
    sp_4b = build_segment_pack_device(d, K=8, dtype="int4")
    assert sp_4.qbits == 4 and sp_4b.qbits == 4
    n_seg, cells, cols = sp_f.seg_planes.shape
    K = sp_f.K
    C = cols // (K + 1)
    assert sp_4.seg_planes.shape == (n_seg, cells, (K // 2 + 1) * C)
    np.testing.assert_array_equal(np.asarray(sp_4b.seg_planes),
                                  np.asarray(sp_4.seg_planes))
    np.testing.assert_allclose(np.asarray(sp_4b.scales),
                               np.asarray(sp_4.scales), rtol=1e-6)

    # decode exactness vs an independent numpy nibble unpack
    v = np.asarray(sp_f.seg_planes, np.float32).reshape(
        n_seg, cells, K + 1, C)
    amax = np.abs(v).max(axis=1)
    scale = np.where(amax > 0, amax / 7.0, 1.0)
    q_ref = np.clip(np.round(v / scale[:, None]), -7, 7)
    pk = np.asarray(sp_4.seg_planes).reshape(n_seg, cells, K // 2 + 1, C)
    dec = np.empty((n_seg, cells, K + 2, C), np.int8)
    dec[:, :, 0::2] = (pk << 4) >> 4          # low nibble, sign-extended
    dec[:, :, 1::2] = pk >> 4                 # high nibble (arithmetic)
    np.testing.assert_array_equal(dec[:, :, :K + 1], q_ref)
    np.testing.assert_allclose(np.asarray(sp_4.scales), scale, rtol=1e-6)

    # trace + image closeness on both even-stride tiers x weights modes
    s0 = init_beam(jax.random.PRNGKey(90), 4096, 2e-3, 1e-3, EXT,
                   "circular")
    for integ in ("rk2s2", "rk2s4"):
        for w in ("stage", "slab"):
            ref = np.asarray(solve_zscan_segments(
                s0, d, spack=sp_f, integrator=integ, weights=w).sf)
            out = np.asarray(solve_zscan_segments(
                s0, d, spack=sp_4, integrator=integ, weights=w).sf)
            np.testing.assert_allclose(out[0], ref[0], atol=5e-5,
                                       err_msg=f"{integ}/{w}")
    H = np.asarray(pipeline.run(d, s0, spack=sp_f, solver="zscan_seg",
                                bins=(54, 40), integrator="rk2s2"))
    H4 = np.asarray(pipeline.run(d, s0, spack=sp_4, solver="zscan_seg",
                                 bins=(54, 40), integrator="rk2s2"))
    assert H4.sum() == H.sum()
    assert np.abs(H4 - H).sum() <= 0.06 * H.sum()


def test_int4_pack_guards():
    """int4 packs are even-stride only: odd K and single-stride
    integrators are rejected with actionable errors."""
    from synthpy_tpu.fields.domain import layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          march_segment,
                                          quantize_segment_pack)

    d = ScalarDomain(2 * EXT, 17).test_lens(ne_0=5e24, LR=1.5e-3)
    with pytest.raises(ValueError, match="even K"):
        build_segment_pack_device(d, K=7, dtype="int4")
    sp_f = build_segment_pack_device(d, K=7, dtype=jnp.float32)
    with pytest.raises(ValueError, match="even K"):
        quantize_segment_pack(sp_f, bits=4)
    with pytest.raises(ValueError, match="bits"):
        quantize_segment_pack(sp_f, bits=5)

    sp_4 = build_segment_pack_device(d, K=8, dtype="int4")
    lay = layout_of(d)
    u = jnp.zeros((16, 8))
    for integ in ("rk4", "rk2"):
        with pytest.raises(ValueError, match="int4"):
            march_segment(u, sp_4.seg_planes[0], sp_4.origin_ab,
                          sp_4.inv_spacing_ab, sp_4.dp,
                          shape_ab=sp_4.shape_ab, layout=lay,
                          K=sp_4.K, C=3, integrator=integ,
                          scales=sp_4.scales[0], qbits=4)


def test_decimated_pack_rk2s2_equals_rk2s4():
    """Plane-decimated packs: rk2s4 on the full pack reads exactly
    planes (4j, 4j+2) with update cols + 4dp*k2 — which IS rk2s2 on the
    stride-2 pack (planes (2j', 2j'+1), h = 2*dp' = 4dp). The decimated
    pack halves the per-ray corner-gather row bytes (the march's
    measured binding constraint), so the equivalence converts a pack-
    layout artifact into throughput with BIT-IDENTICAL exit states.
    Also: the builder's fused plane_stride= path == post-hoc
    decimate_segment_pack, and composing with int4 quantisation keeps
    the bit-parity (per-plane scales are unchanged by decimation)."""
    from synthpy_tpu.fields.domain import layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          decimate_segment_pack,
                                          quantize_segment_pack,
                                          trace_zscan_segments)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    sp_d = decimate_segment_pack(sp_f, stride=2)
    assert sp_d.K == 4 and sp_d.dp == 2 * sp_f.dp
    # both builder routes: post-hoc (default under the fuse threshold)
    # and the FUSED strided seg_fn (forced via fuse_threshold_bytes=0,
    # the 1024^3-class route) must equal the standalone decimation
    for thresh in (4 << 30, 0):
        sp_db = build_segment_pack_device(d, K=8, dtype=jnp.float32,
                                          plane_stride=2,
                                          fuse_threshold_bytes=thresh)
        np.testing.assert_array_equal(np.asarray(sp_db.seg_planes),
                                      np.asarray(sp_d.seg_planes))
        assert sp_db.K == sp_d.K and sp_db.dp == sp_d.dp

    s0 = init_beam(jax.random.PRNGKey(21), 256, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]],
                  axis=1)
    n_seg = sp_f.seg_planes.shape[0]

    def run(sp, integ, **kw):
        return np.asarray(trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab,
            jnp.float32(sp.dp), shape_ab=sp.shape_ab, layout=lay,
            K=sp.K, n_seg=n_seg, integrator=integ, **kw))

    # float: bit-identical exit states
    ref = run(sp_f, "rk2s4")
    np.testing.assert_array_equal(run(sp_d, "rk2s2"), ref)

    # int4 composition: quantise AFTER decimating; scales per stored
    # plane are the full pack's at the kept planes -> still bit-identical
    sp_f4 = quantize_segment_pack(sp_f, bits=4)
    sp_d4 = quantize_segment_pack(sp_d, bits=4)
    for thresh in (4 << 30, 0):
        sp_d4b = build_segment_pack_device(d, K=8, dtype="int4",
                                           plane_stride=2,
                                           fuse_threshold_bytes=thresh)
        np.testing.assert_array_equal(np.asarray(sp_d4b.seg_planes),
                                      np.asarray(sp_d4.seg_planes))
    ref4 = run(sp_f4, "rk2s4", seg_scales=sp_f4.scales, qbits=4)
    np.testing.assert_array_equal(
        run(sp_d4, "rk2s2", seg_scales=sp_d4.scales, qbits=4), ref4)

    # weights="slab" fast mode holds the equivalence too
    ref_s = run(sp_f, "rk2s4", weights="slab")
    np.testing.assert_array_equal(run(sp_d, "rk2s2", weights="slab"),
                                  ref_s)

    # guards
    with pytest.raises(ValueError, match="stride"):
        decimate_segment_pack(sp_f, stride=3)


def test_decimate_quantise_commute():
    """Decimation and quantisation commute BIT-identically: scales are
    per-(segment, plane, channel), so keeping every stride-th plane's
    codes+scales == re-quantising the decimated float pack. This is
    what lets the one-shot stride tiers build the full pack directly at
    the quantised dtype (~2x faster than the f32 full build the float
    route needs) and decimate that."""
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          decimate_segment_pack,
                                          quantize_segment_pack)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    for bits in (8, 4):
        for stride in (2, 4):
            a = decimate_segment_pack(quantize_segment_pack(sp_f, bits),
                                      stride)
            b = quantize_segment_pack(decimate_segment_pack(sp_f, stride),
                                      bits)
            np.testing.assert_array_equal(np.asarray(a.seg_planes),
                                          np.asarray(b.seg_planes))
            np.testing.assert_array_equal(np.asarray(a.scales),
                                          np.asarray(b.scales))
            assert (a.K, a.dp, a.n_slabs, a.qbits) == (b.K, b.dp,
                                                       b.n_slabs, b.qbits)
    # the builder's quantised post-hoc stride route rides this commute
    sp_b = build_segment_pack_device(d, K=8, dtype="int4", plane_stride=2)
    sp_m = decimate_segment_pack(
        quantize_segment_pack(sp_f, bits=4), stride=2)
    np.testing.assert_array_equal(np.asarray(sp_b.seg_planes),
                                  np.asarray(sp_m.seg_planes))
    # int4 output planes must still pair per byte
    with pytest.raises(ValueError, match="even"):
        decimate_segment_pack(quantize_segment_pack(sp_f, bits=4),
                              stride=8)


def test_decimated_rk2s4_stride8_image_equivalent():
    """rk2s4 on a stride-2 pack = effective-stride-8 tier (8-cell
    steps). Exit states drift at the same order as rk2s4 itself vs rk4;
    gate the detector image like the rk2s4 tier's own gate."""
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import build_segment_pack_device

    d = ScalarDomain(2 * EXT, 65).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(22), 4000, 1.5e-3, 1e-3, EXT,
                   "circular")
    sp_f = build_segment_pack_device(d, K=16, dtype=jnp.float32)
    sp_d = build_segment_pack_device(d, K=16, dtype=jnp.float32,
                                     plane_stride=2)
    H = np.asarray(pipeline.run(d, s0, spack=sp_f, solver="zscan_seg",
                                bins=(64, 64), integrator="rk4",
                                critical_guard=None))
    H8 = np.asarray(pipeline.run(d, s0, spack=sp_d, solver="zscan_seg",
                                 bins=(64, 64), integrator="rk2s4",
                                 critical_guard=None))
    assert H8.sum() == H.sum()          # all rays still land
    assert np.abs(H8 - H).sum() <= 0.10 * H.sum()


def test_dithered_quantisation_routes_and_accuracy():
    """Dithered quantisation: (1) the fused in-kernel builder, the
    post-hoc quantiser and the strided routes are bit-identical for the
    same key (noise keyed by absolute plane index); (2) exact zeros stay
    exact (vacuum rays march bit-straight); (3) on the smooth lens field
    the dithered int4 march's exit error is smaller than deterministic
    rounding's (the bias-vs-random-walk accumulation argument —
    measured 12x at 512^3, scratch/probe_int4_dither.py)."""
    from synthpy_tpu.fields.domain import layout_of
    from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                          decimate_segment_pack,
                                          quantize_segment_pack,
                                          solve_zscan_segments)

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    sp_f = build_segment_pack_device(d, K=8, dtype=jnp.float32)

    # (1) builder == quantizer, both bit depths; strided routes agree
    for bits, dt in ((8, jnp.int8), (4, "int4")):
        a = build_segment_pack_device(d, K=8, dtype=dt, dither=7)
        b = quantize_segment_pack(sp_f, bits, dither=7)
        np.testing.assert_array_equal(np.asarray(a.seg_planes),
                                      np.asarray(b.seg_planes))
    full4 = build_segment_pack_device(d, K=8, dtype="int4", dither=7)
    for thresh in (4 << 30, 0):
        s2 = build_segment_pack_device(d, K=8, dtype="int4",
                                       plane_stride=2, dither=7,
                                       fuse_threshold_bytes=thresh)
        np.testing.assert_array_equal(
            np.asarray(s2.seg_planes),
            np.asarray(decimate_segment_pack(full4, 2).seg_planes))

    # different key -> different pack; f32 + dither rejected
    other = build_segment_pack_device(d, K=8, dtype="int4", dither=8)
    assert (np.asarray(other.seg_planes)
            != np.asarray(full4.seg_planes)).any()
    with pytest.raises(ValueError, match="quantised"):
        build_segment_pack_device(d, K=8, dtype=jnp.float32, dither=7)

    # (2) vacuum stays exactly zero under dither
    dv = ScalarDomain(2 * EXT, 17).test_null()
    spv = build_segment_pack_device(dv, K=8, dtype=jnp.int8, dither=7)
    assert not np.asarray(spv.seg_planes).any()

    # (3) accuracy: dithered int4 beats deterministic int4 on the lens
    s0 = init_beam(jax.random.PRNGKey(5), 2000, 1.5e-3, 0.0, EXT,
                   "circular")
    ref = np.asarray(solve_zscan_segments(
        s0, d, spack=sp_f, integrator="rk2s2").sf)

    def rms(sp):
        sf = np.asarray(solve_zscan_segments(
            s0, d, spack=sp, integrator="rk2s2").sf)
        return float(np.sqrt(((sf[0] - ref[0]) ** 2
                              + (sf[1] - ref[1]) ** 2).mean()))

    det = rms(quantize_segment_pack(sp_f, 4))
    dit = rms(quantize_segment_pack(sp_f, 4, dither=7))
    assert dit < det


def test_segment_pack_save_load_cache_roundtrip(tmp_path):
    from synthpy_tpu.tracer.zscan import (
        build_segment_pack_device, cached_build_segment_pack,
        load_segment_pack, save_segment_pack)

    d = ScalarDomain(1e-2, 17).test_lens(ne_0=1e25, LR=2e-3)
    for dtype in (jnp.bfloat16, jnp.int8, "int4"):
        sp = build_segment_pack_device(d, K=8, dtype=dtype)
        p = str(tmp_path / f"pack_{dtype}.npz")
        save_segment_pack(p, sp)
        sp2 = load_segment_pack(p)
        np.testing.assert_array_equal(np.asarray(sp.seg_planes),
                                      np.asarray(sp2.seg_planes))
        assert sp2.K == sp.K and sp2.n_slabs == sp.n_slabs
        assert sp2.qbits == sp.qbits and sp2.dp == sp.dp
        if sp.scales is not None:
            np.testing.assert_array_equal(np.asarray(sp.scales),
                                          np.asarray(sp2.scales))
        else:
            assert sp2.scales is None

    # content-keyed cache: miss builds + saves, hit loads bit-identically;
    # the marched image is identical either way
    cache = str(tmp_path / "cache")
    d1 = ScalarDomain(1e-2, 17).test_lens(ne_0=1e25, LR=2e-3)
    spA = cached_build_segment_pack(d1, cache, K=8, dtype=jnp.int8)
    assert len(os.listdir(cache)) == 1
    d2 = ScalarDomain(1e-2, 17).test_lens(ne_0=1e25, LR=2e-3)
    spB = cached_build_segment_pack(d2, cache, K=8, dtype=jnp.int8)
    assert len(os.listdir(cache)) == 1  # hit, no second file
    np.testing.assert_array_equal(np.asarray(spA.seg_planes),
                                  np.asarray(spB.seg_planes))
    # a different field or config misses
    d3 = ScalarDomain(1e-2, 17).test_lens(ne_0=2e25, LR=2e-3)
    cached_build_segment_pack(d3, cache, K=8, dtype=jnp.int8)
    assert len(os.listdir(cache)) == 2
    cached_build_segment_pack(d2, cache, K=8, dtype="int4")
    assert len(os.listdir(cache)) == 3

    s0 = init_beam(jax.random.PRNGKey(0), 500, 2e-3, 0.0, 5e-3,
                   "circular", "z")
    from synthpy_tpu import pipeline
    imgA = pipeline.run(d1, s0, spack=spA, solver="zscan_seg",
                        bins=(41, 31), critical_guard=None)
    imgB = pipeline.run(d2, s0, spack=spB, solver="zscan_seg",
                        bins=(41, 31), critical_guard=None)
    np.testing.assert_array_equal(np.asarray(imgA), np.asarray(imgB))


@pytest.mark.parametrize("dtype", ["f32", "bf16", "int8", "int4"])
def test_upload_builder_bit_identical_to_device_builder(dtype):
    # the 1024^3 full-physics route: host volumes stream UP, the pack
    # stays device-resident — must be BIT-identical to the monolithic
    # device builder for every dtype (same channel math, stencils,
    # dither keys), including pad segments (n_slabs=20 over K=8 -> 3
    # segments with 4 pad slabs)
    from synthpy_tpu.tracer.zscan import (PACK_DTYPES,
                                          build_segment_pack_device,
                                          build_segment_pack_upload)

    n = 21
    rng = np.random.default_rng(5)
    d = ScalarDomain(1e-2, n)
    ne = (1e24 * (1.0 + 0.5 * rng.standard_normal((n, n, n)))
          ).astype(np.float32)
    d.external_ne(np.abs(ne), host=True)
    d.external_Te(np.full((n,) * 3, 40.0, np.float32), host=True)
    d.external_Z(np.full((n,) * 3, 3.0, np.float32), host=True)
    B = rng.standard_normal((n, n, n, 3)).astype(np.float32) * 5.0
    d.external_B(B, host=True)
    d.inv_brems = True
    d.phaseshift = True

    def dev_domain():
        d2 = ScalarDomain(1e-2, n)
        d2.external_ne(np.asarray(d.ne))
        d2.external_Te(np.asarray(d.Te))
        d2.external_Z(np.asarray(d.Z))
        d2.external_B(np.asarray(d.B))
        d2.inv_brems = True
        d2.phaseshift = True
        return d2

    dt = PACK_DTYPES[dtype]
    dith = 11 if dtype in ("int8", "int4") else None
    ref = build_segment_pack_device(dev_domain(), K=8, dtype=dt,
                                    dither=dith)
    up = build_segment_pack_upload(d, K=8, dtype=dt, plane_batch=4,
                                   dither=dith)
    np.testing.assert_array_equal(np.asarray(ref.seg_planes),
                                  np.asarray(up.seg_planes))
    assert up.K == ref.K and up.n_slabs == ref.n_slabs
    assert up.qbits == ref.qbits
    if ref.scales is not None:
        np.testing.assert_array_equal(np.asarray(ref.scales),
                                      np.asarray(up.scales))
    np.testing.assert_allclose(np.asarray(up.origin_ab),
                               np.asarray(ref.origin_ab))
    assert up.dp == ref.dp and up.p0 == ref.p0


@pytest.mark.parametrize("dtype", ["f32", "int8", "int4"])
def test_synth_builder_matches_upload_builder(dtype):
    # device-native scene synthesis (the config[4] analytic-scene route):
    # jittable field closures evaluated plane-batch by plane-batch on
    # device must produce the same pack as materialising the closures
    # into volumes and streaming them up — same channel math, stencils,
    # boundary margins and dither keys via the shared
    # _channel_batch_writer (incl. pad segments: n_slabs=20 over K=8).
    # NOT bit-identical: XLA fuses the closure into the batch program
    # with fma contraction, so the synthesised planes differ from the
    # eagerly materialised volume at the ulp level (measured 2e-7
    # relative) — f32 channels match to rounding, quantised codes to
    # 1 LSB at rounding ties.
    from synthpy_tpu.tracer.zscan import (PACK_DTYPES,
                                          build_segment_pack_synth,
                                          build_segment_pack_upload)

    n = 21
    ext = 5e-3

    def ne_fn(x, y, z):
        return (8e23 * jnp.exp(-(x**2 + y**2) / (2e-3) ** 2)
                * (1.0 + 0.3 * jnp.cos(2 * jnp.pi * z / 3e-3)))

    def te_fn(x, y, z):
        return 40.0 + 5.0 * jnp.exp(-(x**2 + y**2 + z**2) / (3e-3) ** 2)

    def z_fn(x, y, z):
        return 3.0 + 0.0 * (x + y + z)

    def b_fn(x, y, z):
        r = jnp.sqrt(x**2 + y**2) + 1e-12
        bmag = 5.0 * (r / 1.5e-3) / (1.0 + (r / 1.5e-3) ** 2)
        return (-y / r * bmag + 0.0 * z, x / r * bmag, 0.0 * x + 0.0 * z)

    fields = {"ne": ne_fn, "Te": te_fn, "Z": z_fn, "B": b_fn}

    d_syn = ScalarDomain(2 * ext, n)
    d_syn.inv_brems = True
    d_syn.phaseshift = True
    d_syn.B_on = True

    # materialise the SAME closures on the full grid for the upload route
    X = d_syn.x[:, None, None]
    Y = d_syn.y[None, :, None]
    Z_ = d_syn.z[None, None, :]
    full = (n, n, n)
    d_up = ScalarDomain(2 * ext, n)
    d_up.external_ne(np.asarray(jnp.broadcast_to(ne_fn(X, Y, Z_), full)),
                     host=True)
    d_up.external_Te(np.asarray(jnp.broadcast_to(te_fn(X, Y, Z_), full)),
                     host=True)
    d_up.external_Z(np.asarray(jnp.broadcast_to(z_fn(X, Y, Z_), full)),
                    host=True)
    B = np.stack([np.asarray(jnp.broadcast_to(c, full))
                  for c in b_fn(X, Y, Z_)], axis=-1)
    d_up.external_B(B, host=True)
    d_up.inv_brems = True
    d_up.phaseshift = True

    dt = PACK_DTYPES[dtype]
    dith = 11 if dtype in ("int8", "int4") else None
    up = build_segment_pack_upload(d_up, K=8, dtype=dt, plane_batch=4,
                                   dither=dith)
    syn = build_segment_pack_synth(d_syn, fields, K=8, dtype=dt,
                                   plane_batch=4, dither=dith)
    assert syn.K == up.K and syn.n_slabs == up.n_slabs
    assert syn.qbits == up.qbits
    a_up = np.asarray(up.seg_planes)
    a_syn = np.asarray(syn.seg_planes)
    if dtype == "f32":
        # per-column (plane*channel) scale: gradient channels sit at
        # ~1e12 while near-zero entries carry the ulp noise
        colmax = np.abs(a_up).max(axis=(0, 1))
        np.testing.assert_array_less(
            np.abs(a_up - a_syn),
            2e-5 * np.abs(a_up) + 1e-5 * colmax + 1e-30)
    else:
        su = np.asarray(up.scales)   # (n_seg, K+1, C); 1.0 = amax==0
        ss = np.asarray(syn.scales)
        su0 = np.where(su == 1.0, 0.0, su)
        ss0 = np.where(ss == 1.0, 0.0, ss)
        ok = np.isclose(su, ss, rtol=1e-5)
        assert ok.mean() > 0.9
        # mismatching planes must be ulp-noise planes: an analytically
        # zero gradient where the two routes' rounding residue differs —
        # physically negligible vs the channel's real scale
        chmax = su0.max(axis=(0, 1), keepdims=True) + 1e-30
        assert (np.maximum(su0, ss0)[~ok]
                < 1e-3 * np.broadcast_to(chmax, su.shape)[~ok]).all()
        if dtype == "int4":  # sign-extend nibble codes before comparing
            def _nib(a):
                raw = np.stack([a & 15, (a >> 4) & 15]).astype(np.int16)
                return (raw ^ 8) - 8
            a_up, a_syn = _nib(a_up), _nib(a_syn)
        # codes compared where the plane scales agree (noise planes
        # quantise different residue with different scales)
        n_seg_, K1, C = su.shape
        plane_ok = ok.all(axis=2)              # (n_seg, K+1)
        na_nb = a_up.shape[-2]
        if dtype == "int4":                    # (2, n_seg, rows, bytes*C)
            byte_of = np.repeat(np.arange((K1 + 1) // 2), C)
            m = np.stack([plane_ok[:, 2 * byte_of],
                          plane_ok[:, np.minimum(2 * byte_of + 1, K1 - 1)]])
            m = np.broadcast_to(m[:, :, None, :], a_up.shape)
        else:
            col_of = np.repeat(np.arange(K1), C)
            m = np.broadcast_to(plane_ok[:, col_of][:, None, :],
                                a_up.shape)
        mism = (a_up != a_syn) & m
        assert mism.mean() < 0.01, f"{mism.mean():.4f} of codes differ"
        # ties flip by exactly one code
        d16 = (a_up.astype(np.int16) - a_syn.astype(np.int16))[mism]
        if d16.size:
            assert np.abs(d16).max() <= 1
    np.testing.assert_allclose(np.asarray(syn.origin_ab),
                               np.asarray(up.origin_ab))
    assert syn.dp == up.dp and syn.p0 == up.p0


def test_synth_builder_requires_closures_and_traces_arrayless_domain():
    # a synth-built pack must trace through pipeline.run on a domain that
    # carries ONLY flags (no volumes anywhere — the whole point)
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer.zscan import build_segment_pack_synth

    n = 17
    d = ScalarDomain(1e-2, n, phaseshift=True)
    with pytest.raises(ValueError):
        build_segment_pack_synth(d)  # no closures anywhere
    d.inv_brems = True
    with pytest.raises(RuntimeError):
        build_segment_pack_synth(
            d, {"ne": lambda x, y, z: 1e23 + 0.0 * (x + y + z)})
    d.inv_brems = False

    sp = build_segment_pack_synth(
        d, {"ne": lambda x, y, z:
            1e24 * jnp.exp(-(x**2 + y**2) / (2e-3) ** 2) + 0.0 * z},
        K=8, dtype=jnp.float32)
    s0 = init_beam(jax.random.PRNGKey(0), 400, 2e-3, 0.0, 5e-3,
                   "circular", "z")
    img = pipeline.run(d, s0, spack=sp, solver="zscan_seg",
                       bins=(31, 23), critical_guard=None)
    assert np.isfinite(np.asarray(img)).all()
    assert np.asarray(img).sum() > 0

    # analytic test fields are the default closure source
    d2 = ScalarDomain(1e-2, n).test_lens()
    sp2 = build_segment_pack_synth(d2, K=8, dtype=jnp.float32)
    img2 = pipeline.run(d2, s0, spack=sp2, solver="zscan_seg",
                        bins=(31, 23), critical_guard=None)
    assert np.isfinite(np.asarray(img2)).all()


def test_pack_dtype_auto_advisor_and_pipeline_mode():
    from synthpy_tpu.tracer.zscan import PackTierAdvice, suggest_pack_dtype
    from synthpy_tpu import pipeline
    from synthpy_tpu.fields.grf import grf_domain_fft, power_law

    # regime split (calibration anchors measured round 3): the smooth
    # focusing lens must advise a finer tier than weak turbulence
    d_lens = ScalarDomain(1e-2, 65).test_lens(ne_0=5e24, LR=1.5e-3)
    adv_lens = suggest_pack_dtype(d_lens)
    _, f = grf_domain_fft(jax.random.PRNGKey(0), power_law(-11.0 / 3.0),
                          l_max=2e-3, l_min=4e-4, extent=5e-3, res=32)
    d_turb = ScalarDomain(1e-2, 64)
    d_turb.external_ne(1e23 * (1.0 + 0.5 * jnp.asarray(f)))
    adv_turb = suggest_pack_dtype(d_turb)
    assert adv_turb["name"] == "int4" and adv_turb["dither"] is not None
    assert adv_lens["chi"] > adv_turb["chi"]
    assert adv_lens["name"] in ("int8", "bf16")

    # pipeline.run(pack_dtype="auto") warns with the choice and its image
    # stays close to the exact f32 pack (the existing int8/int4 envelope)
    s0 = init_beam(jax.random.PRNGKey(1), 20000, 2e-3, 0.0, 5e-3,
                   "circular", "z")
    img_f32 = pipeline.run(d_lens, s0, solver="zscan_seg", bins=(41, 31),
                           critical_guard=None, integrator="rk2s2",
                           seg_K=16)
    with pytest.warns(PackTierAdvice, match="chose"):
        img_auto = pipeline.run(d_lens, s0, solver="zscan_seg",
                                bins=(41, 31), critical_guard=None,
                                integrator="rk2s2", seg_K=16,
                                pack_dtype="auto")
    rel = (np.abs(np.asarray(img_auto) - np.asarray(img_f32)).sum()
           / np.asarray(img_f32).sum())
    assert rel < 0.05, rel
    # explicit tier spelling works too
    img_int8 = pipeline.run(d_lens, s0, solver="zscan_seg", bins=(41, 31),
                            critical_guard=None, integrator="rk2s2",
                            seg_K=16, pack_dtype="int8")
    rel8 = (np.abs(np.asarray(img_int8) - np.asarray(img_f32)).sum()
            / np.asarray(img_f32).sum())
    assert rel8 < 0.05, rel8
    # int4 advice falls back to int8 when the integrator can't stride
    with pytest.warns(PackTierAdvice, match="int4 needs"):
        pipeline.run(d_turb, s0, solver="zscan_seg", bins=(41, 31),
                     critical_guard=None, seg_K=16, pack_dtype="auto")
