"""Sharding equivalence tests on the 8-fake-device CPU mesh.

The gate the reference never had: N-device results must match 1-device
results (SURVEY.md section 4 implication (5))."""

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.parallel import (
    grid_ray_mesh,
    make_gridsharded_tracer,
    ray_mesh,
    replicate,
    shard_rays,
    sharded_histogram,
)
from synthpy_tpu import pipeline
from synthpy_tpu.tracer import init_beam, solve, trace_rk4
from synthpy_tpu.tracer.propagator import default_n_steps

EXT = 5e-3


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_ray_sharded_trace_matches_single_device():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    s0 = init_beam(jax.random.PRNGKey(0), 256, 1.5e-3, 0.0, EXT, "circular")
    s_rows = jnp.asarray(s0).T

    n_steps = 64
    dt = jnp.float32(jnp.sqrt(8.0) * EXT / 2.99792458e8 / n_steps)
    ref = np.asarray(trace_rk4(s_rows, pack.channels, pack.origin,
                               pack.inv_spacing, dt,
                               layout=layout_of(d), n_steps=n_steps))

    mesh = ray_mesh()
    s_sh = shard_rays(s_rows, mesh)
    ch = replicate(pack.channels, mesh)
    out = np.asarray(trace_rk4(s_sh, ch, pack.origin, pack.inv_spacing, dt,
                               layout=layout_of(d), n_steps=n_steps))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)


def test_gridsharded_trace_matches_replicated():
    """Field sharded along x over 4 devices + halo exchange == replicated."""
    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    pack = build_pack(d)
    layout = layout_of(d)
    s0 = init_beam(jax.random.PRNGKey(1), 64, 2.0e-3, 1e-3, EXT, "circular")
    s_rows = jnp.asarray(s0).T

    n_steps = 48
    dt = jnp.float32(jnp.sqrt(8.0) * EXT / 2.99792458e8 / n_steps)
    ref = np.asarray(trace_rk4(s_rows, pack.channels, pack.origin,
                               pack.inv_spacing, dt,
                               layout=layout, n_steps=n_steps))

    mesh = grid_ray_mesh(n_grid=4, n_rays=2)
    tracer = make_gridsharded_tracer(mesh, layout, n_steps,
                                     nx_global=d.dims[0])
    out = np.asarray(tracer(s_rows, pack.channels, pack.origin,
                            pack.inv_spacing, dt))
    # different f32 reduction order (local interp + psum) accumulates
    # last-ulp differences over the scan; compare per-column at 1e-4 of the
    # column scale
    for col in range(9):
        scale = max(np.abs(ref[:, col]).max(), 1e-30)
        np.testing.assert_allclose(out[:, col] / scale, ref[:, col] / scale,
                                   atol=1e-4)


def test_sharded_histogram_matches_numpy():
    mesh = ray_mesh()
    rng = np.random.default_rng(0)
    N = 8000
    x = rng.uniform(-9, 9, N).astype(np.float32)
    y = rng.uniform(-6.75, 6.75, N).astype(np.float32)
    w = np.ones(N, np.float32)
    hist = sharded_histogram(mesh, (64, 48), ((-9.0, 9.0), (-6.75, 6.75)))
    H = np.asarray(hist(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
    Href, _, _ = np.histogram2d(x, y, bins=[64, 48],
                                range=[[-9, 9], [-6.75, 6.75]])
    np.testing.assert_allclose(H, Href.T, atol=0)


def test_fused_pipeline_shadowgraphy_and_coherent():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(2), 2048, 2e-3, 0.0, EXT, "circular")
    H = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                bins=(108, 80)))
    assert H.shape == (80, 108)
    assert H.sum() > 0.9 * 2048  # nearly all rays land on the detector

    d.phaseshift = True
    H2 = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                 bins=(108, 80)))
    assert H2.shape == (80, 108) and np.isfinite(H2).all() and H2.max() > 0


def test_fused_pipeline_sharded_equals_unsharded():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    s0 = init_beam(jax.random.PRNGKey(3), 512, 2e-3, 0.0, EXT, "circular")
    H_ref = np.asarray(pipeline.run(d, s0, pack=pack, bins=(54, 40)))

    mesh = ray_mesh()
    s_sh = shard_rays(jnp.asarray(s0).T, mesh)
    n_steps = default_n_steps(d, EXT, 1.0)
    dt = jnp.float32(jnp.sqrt(8.0) * EXT / 2.99792458e8 / n_steps)
    H_sh = np.asarray(pipeline.synth_image(
        s_sh, replicate(pack.channels, mesh), pack.origin, pack.inv_spacing,
        dt, jnp.float32(EXT), layout=layout_of(d), n_steps=n_steps,
        bins=(54, 40)))
    np.testing.assert_allclose(H_sh, H_ref, atol=1e-3)


def test_solve_with_sharded_input_runs():
    """tracer.solve accepts pre-sharded rays transparently (GSPMD)."""
    d = ScalarDomain(2 * EXT, 21).test_null()
    s0 = init_beam(jax.random.PRNGKey(4), 64, 1e-3, 0.0, EXT, "circular")
    mesh = ray_mesh()
    s_sh = shard_rays(jnp.asarray(s0).T, mesh).T
    res = solve(s_sh, d, n_steps=16)
    assert np.isfinite(np.asarray(res.rf)).all()


def test_pipeline_solver_equivalence():
    """zscan and time pipelines produce consistent shadowgrams."""
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(9), 4096, 2e-3, 0.0, EXT, "circular")
    Hz = np.asarray(pipeline.run(d, s0, solver="zscan", bins=(54, 40)))
    Ht = np.asarray(pipeline.run(d, s0, solver="time", bins=(54, 40),
                                 steps_per_cell=2.0))
    assert Hz.sum() == Ht.sum()  # same rays land on the detector
    # images agree to within a small fraction of total intensity
    assert np.abs(Hz - Ht).sum() < 0.05 * Hz.sum()


def test_pipeline_zscan_seg_equivalence():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(11), 4096, 2e-3, 0.0, EXT, "circular")
    Hz = np.asarray(pipeline.run(d, s0, solver="zscan", bins=(54, 40)))
    Hs = np.asarray(pipeline.run(d, s0, solver="zscan_seg", bins=(54, 40),
                                 seg_K=8))
    assert Hs.sum() == Hz.sum()
    assert np.abs(Hs - Hz).sum() < 0.02 * Hz.sum()


def test_ray_sharded_segment_trace_matches():
    from synthpy_tpu.tracer.zscan import (make_segment_pack, make_zscan_pack,
                                          trace_zscan_segments)
    from synthpy_tpu.fields import layout_of as _layout_of

    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    lay = _layout_of(d)
    sp = make_segment_pack(make_zscan_pack(pack, lay), K=8)
    s0 = init_beam(jax.random.PRNGKey(12), 256, 1.5e-3, 0.0, EXT, "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    kwargs = dict(shape_ab=sp.shape_ab, layout=lay, K=sp.K,
                  n_seg=sp.seg_planes.shape[0])
    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp, **kwargs))

    mesh = ray_mesh()
    u_sh = shard_rays(u, mesh)
    out = np.asarray(trace_zscan_segments(
        u_sh, replicate(sp.seg_planes, mesh), replicate(sp.origin_ab, mesh),
        replicate(sp.inv_spacing_ab, mesh), dp, **kwargs))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)


def test_pipelined_segment_tracer_matches_single_device():
    """PP over segments (field sharded by probing depth, rays streamed
    through devices) == single-device segmented trace."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.pipeline_pp import (
        make_pipelined_segment_tracer,
    )
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    pack = build_pack(d)
    lay = _layout_of(d)
    sp = make_segment_pack(make_zscan_pack(pack, lay), K=8)  # 4 segments

    s0 = init_beam(jax.random.PRNGKey(13), 192, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0]))

    mesh = jax.make_mesh((4,), ("seg",), devices=jax.devices()[:4],
                         axis_types=(AxisType.Auto,))
    n_chunks = 3
    chunks = u.reshape(n_chunks, 64, 8)
    tracer = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks)
    out = np.asarray(tracer(chunks, sp.seg_planes, sp.origin_ab,
                            sp.inv_spacing_ab, dp)).reshape(192, 8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-8)


def test_pipeline_run_mesh_equals_single_device():
    """One-call mesh mode: pipeline.run(mesh=...) == unsharded run.

    Ray count deliberately NOT a multiple of 8 to exercise the off-grid
    padding (image-exact). Replaces the reference MPI flow
    (pvti_trace_mpi.py:144-170) with a single call.
    """
    d = ScalarDomain(2 * EXT, 25).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(14), 1001, 2e-3, 0.0, EXT, "circular")
    ref = np.asarray(pipeline.run(d, s0, solver="zscan_seg", bins=(54, 40),
                                  seg_K=8))
    mesh = ray_mesh()
    out = np.asarray(pipeline.run(d, s0, solver="zscan_seg", bins=(54, 40),
                                  seg_K=8, mesh=mesh))
    assert out.sum() == ref.sum()
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_pipeline_run_mesh_coherent_and_time():
    """Mesh mode covers the coherent detector (complex psum) and the
    time-domain tracer path too."""
    d = ScalarDomain(2 * EXT, 17).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(15), 500, 2e-3, 0.0, EXT, "circular")
    mesh = ray_mesh()
    for solver in ("zscan", "time"):
        ref = pipeline.run(d, s0, solver=solver, bins=(30, 22),
                           diagnostic=("shadowgraphy", "interferometry"))
        out = pipeline.run(d, s0, solver=solver, bins=(30, 22),
                           diagnostic=("shadowgraphy", "interferometry"),
                           mesh=mesh)
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       rtol=1e-5, atol=1e-5)


def test_pp_tracer_rk2_matches_single_device_rk2():
    """PP tracer with integrator='rk2' == single-device rk2 march."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.pipeline_pp import (
        make_pipelined_segment_tracer,
    )
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    lay = _layout_of(d)
    sp = make_segment_pack(make_zscan_pack(build_pack(d), lay), K=8)

    s0 = init_beam(jax.random.PRNGKey(15), 128, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0], integrator="rk2"))

    mesh = jax.make_mesh((4,), ("seg",), devices=jax.devices()[:4],
                         axis_types=(AxisType.Auto,))
    tracer = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks=2,
                                           integrator="rk2")
    chunks = u.reshape(2, 64, 8)
    out = np.asarray(tracer(chunks, sp.seg_planes, sp.origin_ab,
                            sp.inv_spacing_ab, dp)).reshape(128, 8)
    # PP and single-chip both run march_segment: identical arithmetic
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_pp_tracer_rk2s2_sharded_chunks_bit_identical():
    """PP with rk2s2 + SHARDED chunk storage (n_chunks % D == 0) is
    bit-identical to the single-chip rk2s2 march — the two paths share
    march_segment, and the sharded injection/collection moves chunks
    without touching their values."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.pipeline_pp import (
        make_pipelined_segment_tracer,
    )
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    lay = _layout_of(d)
    sp = make_segment_pack(make_zscan_pack(build_pack(d), lay), K=8)

    s0 = init_beam(jax.random.PRNGKey(16), 512, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    # rk4/rk2s2 are BIT-identical; rk2s4's K//4=2-length scan is fully
    # unrolled at this test size, exposing context-dependent fma
    # contraction between the two differently-shaped programs — equal to
    # fp tolerance only (values agree to ~1e-5 relative)
    for integ, rtol in (("rk2s2", 0.0), ("rk2s4", 1e-4), ("rk4", 0.0)):
        ref = np.asarray(trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
            shape_ab=sp.shape_ab, layout=lay, K=sp.K,
            n_seg=sp.seg_planes.shape[0], integrator=integ))

        mesh = jax.make_mesh((4,), ("seg",), devices=jax.devices()[:4],
                             axis_types=(AxisType.Auto,))
        tracer = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks=8,
                                               integrator=integ)
        chunks = u.reshape(8, 64, 8)
        out = np.asarray(tracer(chunks, sp.seg_planes, sp.origin_ab,
                                sp.inv_spacing_ab, dp)).reshape(512, 8)
        np.testing.assert_allclose(out, ref, rtol=rtol,
                                   atol=rtol * np.abs(ref).max(),
                                   err_msg=integ)


def test_gridsharded_segment_march_bit_identical():
    """Field sharded along the transverse a-axis on the FAST (segmented)
    path: march_segment(a_offset=...) keeps all arithmetic in global
    coordinates, so the sharded march is BIT-identical to single-device
    (VERDICT r2 item 6). Composes with ray-axis DP on a 2-D mesh."""
    from jax.sharding import AxisType, NamedSharding, PartitionSpec as P

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.mesh import make_gridsharded_segment_tracer
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 24).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    lay = _layout_of(d)
    sp = make_segment_pack(make_zscan_pack(build_pack(d), lay), K=8)
    n_seg = sp.seg_planes.shape[0]
    na, nb = sp.shape_ab
    C = sp.seg_planes.shape[-1] // (sp.K + 1)
    seg_tables = sp.seg_planes.reshape(n_seg, na, nb, (sp.K + 1) * C)

    # beam wider than the grid so some rays live outside (off-grid
    # drifters must survive the ownership logic too)
    s0 = init_beam(jax.random.PRNGKey(21), 256, 7e-3, 1e-3, EXT, "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    # rk4/rk2s2 BIT-identical; rk2s4 fp-tolerance only (fully-unrolled
    # short scans compile with different fma contraction across the two
    # program shapes — see the PP test above)
    for integ, rtol in (("rk4", 0.0), ("rk2s2", 0.0), ("rk2s4", 1e-4)):
        ref = np.asarray(trace_zscan_segments(
            u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
            shape_ab=sp.shape_ab, layout=lay, K=sp.K, n_seg=n_seg,
            integrator=integ))

        mesh = jax.make_mesh((4, 2), ("grid", "rays"),
                             devices=jax.devices()[:8],
                             axis_types=(AxisType.Auto, AxisType.Auto))
        tracer = make_gridsharded_segment_tracer(
            mesh, lay, sp, ray_axis="rays", integrator=integ)
        u_sh = jax.device_put(u, NamedSharding(mesh, P("rays", None)))
        out = np.asarray(tracer(u_sh, seg_tables, sp.origin_ab,
                                sp.inv_spacing_ab, dp))
        np.testing.assert_allclose(out, ref, rtol=rtol,
                                   atol=rtol * np.abs(ref).max(),
                                   err_msg=integ)

def test_pipelined_segment_tracer_int8_matches_single_device():
    """PP over an int8 quantised pack (scales sharded with their
    segments) == the single-device int8 march, bit-for-bit: both run the
    same march_segment dequantisation arithmetic."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.pipeline_pp import (
        make_pipelined_segment_tracer,
    )
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        quantize_segment_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    lay = _layout_of(d)
    sp = quantize_segment_pack(
        make_segment_pack(make_zscan_pack(pack, lay), K=8))
    assert sp.seg_planes.dtype == jnp.int8

    s0 = init_beam(jax.random.PRNGKey(14), 192, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0], integrator="rk2s2",
        seg_scales=sp.scales))

    mesh = jax.make_mesh((4,), ("seg",), devices=jax.devices()[:4],
                         axis_types=(AxisType.Auto,))
    chunks = u.reshape(3, 64, 8)
    tracer = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks=3,
                                           integrator="rk2s2")
    out = np.asarray(tracer(chunks, sp.seg_planes, sp.scales,
                            sp.origin_ab, sp.inv_spacing_ab,
                            dp)).reshape(192, 8)
    np.testing.assert_array_equal(out, ref)

def test_gridsharded_segment_tracer_int8_matches_single_device():
    """Grid-sharded march on an int8 pack (replicated scale rows +
    sharded tables) == single-device int8 march, bit-for-bit."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.mesh import make_gridsharded_segment_tracer
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        quantize_segment_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    lay = _layout_of(d)
    sp = quantize_segment_pack(
        make_segment_pack(make_zscan_pack(pack, lay), K=8))
    s0 = init_beam(jax.random.PRNGKey(15), 160, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0], integrator="rk2s2",
        seg_scales=sp.scales))

    mesh = jax.make_mesh((4,), ("grid",), devices=jax.devices()[:4],
                         axis_types=(AxisType.Auto,))
    na, nb = sp.shape_ab
    n_seg = sp.seg_planes.shape[0]
    Cq = sp.seg_planes.shape[-1] // (sp.K + 1)
    tables = sp.seg_planes.reshape(n_seg, na, nb, (sp.K + 1) * Cq)
    tr = make_gridsharded_segment_tracer(mesh, lay, sp,
                                         integrator="rk2s2")
    out = np.asarray(tr(u, tables, sp.origin_ab, sp.inv_spacing_ab, dp))
    np.testing.assert_array_equal(out, ref)


def test_multichip_marches_int4_match_single_device():
    """int4 nibble packs on BOTH multi-chip paths (PP over segments;
    grid-sharded transverse shard) == the single-device int4 march,
    bit-for-bit: all three run march_segment's nibble decode, and the
    per-(segment, plane, channel) scales are cell-independent so
    sharding composes exactly as for int8."""
    from jax.sharding import AxisType

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.parallel.mesh import make_gridsharded_segment_tracer
    from synthpy_tpu.parallel.pipeline_pp import (
        make_pipelined_segment_tracer,
    )
    from synthpy_tpu.tracer.zscan import (
        make_segment_pack,
        make_zscan_pack,
        quantize_segment_pack,
        trace_zscan_segments,
    )

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d)
    lay = _layout_of(d)
    sp = quantize_segment_pack(
        make_segment_pack(make_zscan_pack(pack, lay), K=8), bits=4)
    assert sp.qbits == 4

    s0 = init_beam(jax.random.PRNGKey(16), 192, 1.5e-3, 1e-3, EXT,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)
    n_seg = sp.seg_planes.shape[0]

    ref = np.asarray(trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K, n_seg=n_seg,
        integrator="rk2s2", seg_scales=sp.scales, qbits=4))

    mesh = jax.make_mesh((4,), ("seg",), devices=jax.devices()[:4],
                         axis_types=(AxisType.Auto,))
    chunks = u.reshape(3, 64, 8)
    tracer = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks=3,
                                           integrator="rk2s2")
    out = np.asarray(tracer(chunks, sp.seg_planes, sp.scales,
                            sp.origin_ab, sp.inv_spacing_ab,
                            dp)).reshape(192, 8)
    np.testing.assert_array_equal(out, ref)

    gmesh = jax.make_mesh((4,), ("grid",), devices=jax.devices()[:4],
                          axis_types=(AxisType.Auto,))
    na, nb = sp.shape_ab
    tables = sp.seg_planes.reshape(n_seg, na, nb,
                                   sp.seg_planes.shape[-1])
    tr = make_gridsharded_segment_tracer(gmesh, lay, sp,
                                         integrator="rk2s2")
    out_g = np.asarray(tr(u, tables, sp.origin_ab, sp.inv_spacing_ab,
                          dp))
    np.testing.assert_array_equal(out_g, ref)


def test_sharded_grf_matches_single_device():
    """grf_domain_fft(mesh=) synthesises the SAME field as the unsharded
    call (same key -> same threefry bits; FFT reduction order only),
    actually distributed over the grid axis (SURVEY.md section 7: sharded
    FFT when grid > 1 device)."""
    from jax.sharding import AxisType
    from synthpy_tpu.fields.grf import grf_domain_fft, kolmogorov

    key = jax.random.PRNGKey(7)
    coords, f1 = grf_domain_fft(key, kolmogorov, 2e-3, 2e-4, 5e-3, 16)

    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    coords_s, fs = grf_domain_fft(key, kolmogorov, 2e-3, 2e-4, 5e-3, 16,
                                  mesh=mesh)
    assert fs.shape == f1.shape == (32, 32, 32)
    # genuinely sharded: 8 distinct single-device shards of 1/8th size
    assert len(fs.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(fs), np.asarray(f1),
                               rtol=0, atol=1e-5)
    for c1, c2 in zip(coords, coords_s):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_sharded_pack_build_bit_identical_and_composes():
    """build_segment_pack_device(mesh=) builds the SAME pack bytes as the
    single-device build (the a-gradient halo exchange is the same stencil
    arithmetic), and the sharded GRF -> sharded pack -> grid-sharded
    march chain runs without any single-device field materialisation."""
    from jax.sharding import AxisType, NamedSharding, PartitionSpec as P

    from synthpy_tpu.fields import layout_of as _layout_of
    from synthpy_tpu.fields.grf import grf_domain_fft, kolmogorov
    from synthpy_tpu.parallel.mesh import make_gridsharded_segment_tracer
    from synthpy_tpu.tracer.zscan import (
        build_segment_pack_device,
        trace_zscan_segments,
    )

    mesh = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    key = jax.random.PRNGKey(3)
    coords, f = grf_domain_fft(key, kolmogorov, 2e-3, 4e-4, EXT, 16,
                               mesh=mesh)
    ne = 1e25 * (1.0 + 0.5 * f)

    d1 = ScalarDomain(2 * EXT, 32).external_ne(np.asarray(ne))
    d1.phaseshift = True
    sp1 = build_segment_pack_device(d1, K=8, dtype=jnp.float32)

    ds = ScalarDomain(2 * EXT, 32).external_ne(ne)  # stays sharded
    ds.phaseshift = True
    sps = build_segment_pack_device(ds, K=8, dtype=jnp.float32, mesh=mesh)
    assert len(sps.seg_planes.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sps.seg_planes),
                                  np.asarray(sp1.seg_planes))

    # quantised + dithered route shards identically (scales replicated)
    spq1 = build_segment_pack_device(d1, K=8, dtype=jnp.int8, dither=5)
    spqs = build_segment_pack_device(ds, K=8, dtype=jnp.int8, dither=5,
                                     mesh=mesh)
    np.testing.assert_array_equal(np.asarray(spqs.seg_planes),
                                  np.asarray(spq1.seg_planes))
    np.testing.assert_array_equal(np.asarray(spqs.scales),
                                  np.asarray(spq1.scales))

    # end-to-end: grid-sharded march consumes the sharded tables directly
    lay = _layout_of(ds)
    n_seg = sps.seg_planes.shape[0]
    na, nb = sps.shape_ab
    tables = sps.seg_planes.reshape(n_seg, na, nb,
                                    sps.seg_planes.shape[-1])
    s0 = init_beam(jax.random.PRNGKey(4), 128, 7e-3, 1e-3, EXT, "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sps.dp)
    tr = make_gridsharded_segment_tracer(mesh, lay, sps, integrator="rk2s2")
    out = np.asarray(tr(u, tables, sps.origin_ab, sps.inv_spacing_ab, dp))
    ref = np.asarray(trace_zscan_segments(
        u, sp1.seg_planes, sp1.origin_ab, sp1.inv_spacing_ab, dp,
        shape_ab=sp1.shape_ab, layout=lay, K=sp1.K, n_seg=n_seg,
        integrator="rk2s2"))
    np.testing.assert_array_equal(out, ref)


def test_pipeline_run_grid_axis_matches_single_device():
    """pipeline.run(mesh=, grid_axis=) — the one-call field-sharded path —
    equals the single-device pipeline image, on both a grid-only mesh
    (capacity sharding) and a 2-D grid x rays mesh."""
    from jax.sharding import AxisType

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = jnp.asarray(init_beam(jax.random.PRNGKey(11), 512, 7e-3, 1e-3,
                               EXT, "circular"))
    ref = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                  solver="zscan_seg", seg_K=8))

    mesh_g = jax.make_mesh((8,), ("grid",), axis_types=(AxisType.Auto,))
    img_g = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                    solver="zscan_seg", seg_K=8,
                                    mesh=mesh_g, grid_axis="grid"))
    np.testing.assert_allclose(img_g, ref, rtol=1e-6)

    mesh_2d = jax.make_mesh((4, 2), ("grid", "rays"),
                            axis_types=(AxisType.Auto, AxisType.Auto))
    img_2d = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                     solver="zscan_seg", seg_K=8,
                                     mesh=mesh_2d, grid_axis="grid"))
    np.testing.assert_allclose(img_2d, ref, rtol=1e-6)


def test_pipeline_run_grid_axis_int8_and_nondivisible_dims():
    """grid_axis= composes with quantised packs (pack_dtype=int8 builds the
    tables sharded, bit-identical to the single-device int8 march), and
    transverse dims that don't divide over the grid axis are padded with
    zero a-rows EXACTLY (the march's mask/clip stay bounded by the real
    na, so pad rows are never owned) — non-power-of-two .pvti fields
    shard without constraint."""
    from jax.sharding import AxisType
    from synthpy_tpu.tracer.zscan import build_segment_pack_device

    mesh = jax.make_mesh((4, 2), ("grid", "rays"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = jnp.asarray(init_beam(jax.random.PRNGKey(5), 1000, 7e-3, 1e-3,
                               EXT, "circular"))
    sp = build_segment_pack_device(d, K=8, dtype=jnp.int8)
    ref = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                  solver="zscan_seg", spack=sp,
                                  integrator="rk2s2", bins=(48, 36)))
    img = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                  solver="zscan_seg", seg_K=8, bins=(48, 36),
                                  mesh=mesh, grid_axis="grid",
                                  pack_dtype=jnp.int8, integrator="rk2s2"))
    np.testing.assert_array_equal(img, ref)

    # 33^3: na=33 pads to 36 over the 4-way grid axis, bit-identical
    d33 = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    ref33 = np.asarray(pipeline.run(d33, s0, diagnostic="shadowgraphy",
                                    solver="zscan_seg", seg_K=8,
                                    bins=(48, 36)))
    img33 = np.asarray(pipeline.run(d33, s0, diagnostic="shadowgraphy",
                                    solver="zscan_seg", seg_K=8,
                                    bins=(48, 36), mesh=mesh,
                                    grid_axis="grid"))
    np.testing.assert_allclose(img33, ref33, rtol=1e-6)


def test_pipeline_run_grid_axis_slab_weights_matches_single_device():
    """seg_weights='slab' (the production fast mode, bench default)
    composes with grid_axis — threaded through to march_segment, matching
    the single-device slab-mode image bit-for-bit."""
    from jax.sharding import AxisType

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = jnp.asarray(init_beam(jax.random.PRNGKey(13), 512, 7e-3, 1e-3,
                               EXT, "circular"))
    ref = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                  solver="zscan_seg", seg_K=8,
                                  seg_weights="slab", bins=(48, 36)))
    mesh = jax.make_mesh((4, 2), ("grid", "rays"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    img = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                  solver="zscan_seg", seg_K=8,
                                  seg_weights="slab", bins=(48, 36),
                                  mesh=mesh, grid_axis="grid",
                                  integrator="rk2s2"))
    ref2 = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                   solver="zscan_seg", seg_K=8,
                                   seg_weights="slab", bins=(48, 36),
                                   integrator="rk2s2"))
    np.testing.assert_array_equal(img, ref2)
    assert ref.sum() == img.sum()


def test_pipeline_run_pp_axis_matches_single_device():
    """pipeline.run(mesh=, pp_axis=) — the one-call depth-pipelined path —
    equals the single-device segmented march bit-for-bit, including
    zero-segment padding when n_seg doesn't divide over the axis, int8
    packs, and the coherent (interferometry) state columns."""
    from jax.sharding import AxisType
    from synthpy_tpu.tracer.zscan import build_segment_pack_device

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = jnp.asarray(init_beam(jax.random.PRNGKey(7), 1000, 7e-3, 1e-3,
                               EXT, "circular"))
    mesh = jax.make_mesh((8,), ("seg",), axis_types=(AxisType.Auto,))

    # K=6 -> n_seg=6, padded to 8 with zero segments the tracer SKIPS
    # (even vacuum marching accumulates f32 rounding). Same spack on both
    # sides = the PP machinery must be BIT-identical, including the
    # coherent phase column.
    sp_f32 = build_segment_pack_device(d, K=6, dtype=jnp.float32)
    for diag in ("shadowgraphy", "interferometry"):
        ref = np.asarray(pipeline.run(d, s0, diagnostic=diag,
                                      solver="zscan_seg", spack=sp_f32,
                                      bins=(48, 36), integrator="rk2s2"))
        img = np.asarray(pipeline.run(d, s0, diagnostic=diag,
                                      solver="zscan_seg", spack=sp_f32,
                                      bins=(48, 36), mesh=mesh,
                                      pp_axis="seg", integrator="rk2s2"))
        if diag == "shadowgraphy":
            np.testing.assert_array_equal(img, ref)
        else:
            # exit states are bit-identical; the final |E|^2 square fuses
            # differently in the fused vs staged program (last-ulp)
            np.testing.assert_allclose(img, ref, atol=1e-6)

    # default build (mesh branch builds its own f32 pack on-device, the
    # single path regroups the host pack): same accuracy class, fp-level
    # builder-route difference only
    ref_d = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                    solver="zscan_seg", seg_K=6,
                                    bins=(48, 36), integrator="rk2s2"))
    img_d = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                    solver="zscan_seg", seg_K=6,
                                    bins=(48, 36), mesh=mesh,
                                    pp_axis="seg", integrator="rk2s2"))
    assert np.abs(img_d - ref_d).max() <= 0.1 * ref_d.max()

    # int8 pack through the one-call PP path (scales padded with ones)
    sp = build_segment_pack_device(d, K=6, dtype=jnp.int8)
    ref_q = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                    solver="zscan_seg", spack=sp,
                                    bins=(48, 36), integrator="rk2s2"))
    img_q = np.asarray(pipeline.run(d, s0, diagnostic="shadowgraphy",
                                    solver="zscan_seg", seg_K=6,
                                    pack_dtype=jnp.int8, bins=(48, 36),
                                    mesh=mesh, pp_axis="seg",
                                    integrator="rk2s2"))
    np.testing.assert_array_equal(img_q, ref_q)

    # guard rails
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        pipeline.run(d, s0, solver="zscan_seg", mesh=mesh, pp_axis="seg",
                     grid_axis="seg")
    with pytest.raises(ValueError, match="pp_axis requires"):
        pipeline.run(d, s0, solver="time", mesh=mesh, pp_axis="seg")


def test_pipeline_run_grid_axis_coherent_matches():
    """Interferometry (phase-sensitive) through grid_axis: same spack ==
    single-device to last-ulp; default build stays in the f32 accuracy
    class (the round-3 fix — the bf16 default pack silently degraded
    coherent images that incoherent binning hid)."""
    from jax.sharding import AxisType
    from synthpy_tpu.tracer.zscan import build_segment_pack_device

    d = ScalarDomain(2 * EXT, 32).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = jnp.asarray(init_beam(jax.random.PRNGKey(7), 1000, 7e-3, 1e-3,
                               EXT, "circular"))
    mesh = jax.make_mesh((4, 2), ("grid", "rays"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    sp = build_segment_pack_device(d, K=8, dtype=jnp.float32)
    ref = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                  solver="zscan_seg", spack=sp,
                                  bins=(48, 36), integrator="rk2s2"))
    img = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                  solver="zscan_seg", spack=sp,
                                  bins=(48, 36), mesh=mesh,
                                  grid_axis="grid", integrator="rk2s2"))
    np.testing.assert_allclose(img, ref, atol=1e-5)

    ref_d = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                    solver="zscan_seg", seg_K=8,
                                    bins=(48, 36), integrator="rk2s2"))
    img_d = np.asarray(pipeline.run(d, s0, diagnostic="interferometry",
                                    solver="zscan_seg", seg_K=8,
                                    bins=(48, 36), mesh=mesh,
                                    grid_axis="grid", integrator="rk2s2"))
    assert np.abs(img_d - ref_d).max() <= 0.1 * ref_d.max()
