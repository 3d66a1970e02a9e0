"""End-to-end fused pipelines: trace -> optics -> detector in one jit.

The flagship computation: a ray bundle traced through a plasma domain,
pushed through an optical bench, and binned into a detector image, all as
one XLA program with no host round-trips. The reference runs these stages
as separate Python phases with host transfers and (for MPI) pickled field
broadcasts between them (pvti_trace_mpi.py:144-170); here the whole thing
is a single compiled function that GSPMD shards over a ray mesh axis.

Tracer back-ends:
  * "time"      — the general fixed-step RK4 time integrator
    (tracer.propagator.trace_rk4);
  * "zscan"     — the slab-marching path (tracer.zscan), default;
  * "zscan_seg" — the gather-hoisted segmented march
    (tracer.zscan.trace_zscan_segments), fastest for paraxial bundles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu.constants import C
from synthpy_tpu.fields.domain import (
    ChannelLayout,
    ScalarDomain,
    TracePack,
    build_pack,
    layout_of,
    peak_ne_over_nc,
)
from synthpy_tpu.ops.histogram import complex_histogram, histogram2d
from synthpy_tpu.optics.compose import (
    BENCHES,
    NEEDS_JONES,
    analyser_weight,
    apply_stages,
    interfere_ref_beam,
)
from synthpy_tpu.optics.diagnostics import (
    Interferometry,
    Polarimetry,
    Refractometry,
    Schlieren,
    Shadowgraphy,
)
from synthpy_tpu.optics.rtm import m_to_mm
from synthpy_tpu.tracer.propagator import ray_to_Jonesvector, trace_rk4
from synthpy_tpu.tracer.zscan import (
    _AXIS_OF,
    make_segment_pack,
    make_zscan_pack,
    reassemble_state,
    trace_zscan,
    trace_zscan_segments,
)

DIAGNOSTICS = {
    "shadowgraphy": (Shadowgraphy, "two_lens_solve", False),
    "shadowgraphy_single": (Shadowgraphy, "single_lens_solve", False),
    "shadowgraphy_exp": (Shadowgraphy, "single_exp_solve", False),
    "schlieren_df": (Schlieren, "DF_solve", False),
    "schlieren_lf": (Schlieren, "LF_solve", False),
    "refractometry": (Refractometry, "incoherent_solve", False),
    "refractometry_coherent": (Refractometry, "coherent_solve", True),
    "interferometry": (Interferometry, "two_lens_solve", True),
    # incoherent detector with a Jones-vector analyser weight: linear in
    # rays (exact batch sums) but requires return_E
    "polarimetry": (Polarimetry, "two_lens_solve", False),
}


def _image_from_sf(sf, probing_depth, *, diagnostic, probing_direction,
                   bins, lwl, L, R, Lx, Ly, focal_plane,
                   coherent_convention="legacy", detL=None,
                   n_fringes=10.0, deg=20.0, coherent_raw=False,
                   pol_beta_deg=85.0):
    """Exit state -> optics -> detector (traced, shared by both solvers).

    ``diagnostic`` may be a tuple of names: the exit state is converted
    ONCE and every bench/detector is synthesised from it, returning a
    tuple of images. Multi-diagnostic campaigns trace each ray bundle a
    single time instead of once per diagnostic (the reference re-traces,
    pvti_trace_mpi.py:144-170).
    """
    names = (diagnostic,) if isinstance(diagnostic, str) else diagnostic
    any_coherent = any(BENCHES[n][1] or n in NEEDS_JONES for n in names)
    rf, Jf = ray_to_Jonesvector(sf, probing_depth,
                                probing_direction=probing_direction,
                                return_E=any_coherent)
    r_mm = m_to_mm(rf)
    images = []
    for name in names:
        builder, coherent = BENCHES[name]
        # composed ABCD stages: every aperture-free run of elements is one
        # folded 4x4 matmul (optics.compose; the reference composes these
        # symbolically with sympy, rtm_solver-louis.py:185-271)
        extra = ({"detL": detL} if detL is not None
                 and name == "shadowgraphy_exp" else {})
        stages = builder(L=L, R=R, focal_plane=focal_plane, **extra)
        if name in NEEDS_JONES:
            # Faraday polarimetry: incoherent detector (LINEAR in rays, so
            # batch sums stay exact) with the per-ray analyser weight
            # (optics.compose.analyser_weight — single home of the
            # convention).
            w = analyser_weight(Jf, pol_beta_deg, r_mm.dtype)
            r_out = apply_stages(r_mm, stages)
            H, _, _ = histogram2d(
                r_out[0, :], r_out[2, :], bins,
                ((-Lx / 2, Lx / 2), (-Ly / 2, Ly / 2)), weights=w)
            images.append(H)
        elif coherent:
            E = Jf
            if name == "interferometry":
                E = interfere_ref_beam(r_mm, E, n_fringes, deg)
            r_out, E_out = apply_stages(r_mm, stages, E=E, wavelength=lwl)
            images.append(complex_histogram(
                r_out[0, :], r_out[2, :], E_out[0, :], E_out[1, :],
                bins[0] + 1, bins[1] + 1, Lx, Ly,
                convention=coherent_convention, return_acc=coherent_raw))
        else:
            r_out = apply_stages(r_mm, stages)
            H, _, _ = histogram2d(
                r_out[0, :], r_out[2, :], bins,
                ((-Lx / 2, Lx / 2), (-Ly / 2, Ly / 2)))
            images.append(H)
    if isinstance(diagnostic, str):
        return images[0]
    return tuple(images)


@partial(jax.jit, static_argnames=(
    "layout", "n_steps", "diagnostic", "probing_direction", "bins",
    "ray_chunk", "lwl", "L", "R", "Lx", "Ly", "focal_plane",
    "coherent_convention", "detL", "n_fringes", "deg",
    "coherent_raw", "pol_beta_deg"))
def synth_image(
    s_rows: jnp.ndarray,
    channels: jnp.ndarray,
    origin: jnp.ndarray,
    inv_spacing: jnp.ndarray,
    dt: jnp.ndarray,
    probing_depth: jnp.ndarray,
    *,
    layout: ChannelLayout,
    n_steps: int,
    diagnostic: str = "shadowgraphy",
    probing_direction: str = "z",
    bins: Tuple[int, int] = (431, 321),  # pix/8 of a KAF-8300
    ray_chunk: Optional[int] = None,
    lwl: float = 1064e-9,
    L: float = 400.0,
    R: float = 25.0,
    Lx: float = 18.0,
    Ly: float = 13.5,
    focal_plane: float = 0.0,
    coherent_convention: str = "legacy",
    detL: float | None = None,
    n_fringes: float = 10.0,
    deg: float = 20.0,
    coherent_raw: bool = False,
    pol_beta_deg: float = 85.0,
) -> jnp.ndarray:
    """Time-tracer pipeline on (Np, 9) ray rows. Returns (ny, nx) image.

    ``coherent_raw=True`` returns RAW field-sum accumulators for coherent
    diagnostics (see ops.histogram.complex_histogram) — sum them across
    batches and finalize once for exact cross-batch coherence."""
    sf_rows = trace_rk4(s_rows, channels, origin, inv_spacing, dt,
                        layout=layout, n_steps=n_steps, ray_chunk=ray_chunk)
    return _image_from_sf(
        sf_rows.T, probing_depth, diagnostic=diagnostic,
        probing_direction=probing_direction, bins=bins, lwl=lwl, L=L, R=R,
        Lx=Lx, Ly=Ly, focal_plane=focal_plane,
        coherent_convention=coherent_convention, detL=detL,
        n_fringes=n_fringes, deg=deg, coherent_raw=coherent_raw,
        pol_beta_deg=pol_beta_deg)


@partial(jax.jit, static_argnames=(
    "layout", "n_slabs", "substeps", "diagnostic", "probing_direction",
    "bins", "ray_chunk", "lwl", "L", "R", "Lx", "Ly", "focal_plane", "p0",
    "dp_static", "sort_rays", "segmented", "seg_K", "shape_ab",
    "coherent_convention", "integrator", "detL", "n_fringes", "deg",
    "coherent_raw", "pol_beta_deg", "seg_weights", "seg_qbits"))
def synth_image_zscan(
    s0: jnp.ndarray,
    planes: jnp.ndarray,
    origin_ab: jnp.ndarray,
    inv_ab: jnp.ndarray,
    probing_depth: jnp.ndarray,
    *,
    layout: ChannelLayout,
    n_slabs: int,
    p0: float,
    dp_static: float,
    sort_rays: bool = False,
    segmented: bool = False,
    seg_K: Optional[int] = None,
    shape_ab: Optional[Tuple[int, int]] = None,
    substeps: int = 1,
    diagnostic: str = "shadowgraphy",
    probing_direction: str = "z",
    bins: Tuple[int, int] = (431, 321),
    ray_chunk: Optional[int] = None,
    lwl: float = 1064e-9,
    L: float = 400.0,
    R: float = 25.0,
    Lx: float = 18.0,
    Ly: float = 13.5,
    focal_plane: float = 0.0,
    coherent_convention: str = "legacy",
    integrator: str = "rk4",
    detL: float | None = None,
    n_fringes: float = 10.0,
    deg: float = 20.0,
    coherent_raw: bool = False,
    pol_beta_deg: float = 85.0,
    seg_weights: str = "stage",
    seg_scales: Optional[jnp.ndarray] = None,
    seg_qbits: Optional[int] = None,
) -> jnp.ndarray:
    """z-scan pipeline on a (9, Np) initial state. Returns (ny, nx) image.

    ``seg_scales``: dequantisation table when ``planes`` is a quantised
    SegmentPack (SegmentPack.scales); None for float packs. ``seg_qbits``
    is SegmentPack.qbits (4 marks a nibble-packed int4 table).

    ``sort_rays`` reorders rays by entry cell (histograms are permutation-
    invariant); measured neutral-to-negative once corner gathers are
    hoisted, so off by default.
    """
    p_ax = _AXIS_OF[probing_direction]
    a_ax, b_ax = [a for a in range(3) if a != p_ax]
    u = jnp.stack([s0[a_ax], s0[b_ax], s0[3 + a_ax], s0[3 + b_ax],
                   s0[3 + p_ax], s0[6], s0[7], s0[8]], axis=1)
    if sort_rays:
        nb = shape_ab[1] if segmented else planes.shape[2]
        ta = (u[:, 0] - origin_ab[0]) * inv_ab[0]
        tb = (u[:, 1] - origin_ab[1]) * inv_ab[1]
        cell = (jnp.clip(ta.astype(jnp.int32), 0, None) * nb
                + jnp.clip(tb.astype(jnp.int32), 0, None))
        u = jnp.take(u, jnp.argsort(cell), axis=0)
    dp = jnp.asarray(dp_static, s0.dtype)
    if not segmented and integrator != "rk4":
        raise ValueError("integrator is only selectable on the segmented "
                         "(zscan_seg) path; the plain zscan tracer is rk4")
    if segmented:
        n_seg = planes.shape[0]
        uf = trace_zscan_segments(
            u, planes, origin_ab, inv_ab, dp, shape_ab=shape_ab,
            layout=layout, K=seg_K, n_seg=n_seg, substeps=substeps,
            ray_chunk=ray_chunk, integrator=integrator,
            weights=seg_weights, seg_scales=seg_scales,
            qbits=seg_qbits)
        p_end = p0 + n_seg * seg_K * dp_static
    else:
        uf = trace_zscan(u, planes, origin_ab, inv_ab, dp, layout=layout,
                         n_slabs=n_slabs, substeps=substeps,
                         ray_chunk=ray_chunk)
        p_end = p0 + n_slabs * dp_static
    sf = reassemble_state(uf, p_end, probing_direction)
    return _image_from_sf(
        sf, probing_depth, diagnostic=diagnostic,
        probing_direction=probing_direction, bins=bins, lwl=lwl, L=L, R=R,
        Lx=Lx, Ly=Ly, focal_plane=focal_plane,
        coherent_convention=coherent_convention, detL=detL,
        n_fringes=n_fringes, deg=deg, coherent_raw=coherent_raw,
        pol_beta_deg=pol_beta_deg)


@partial(jax.jit, static_argnames=(
    "diagnostic", "probing_direction", "bins", "lwl", "L", "R", "Lx", "Ly",
    "focal_plane", "coherent_convention", "detL", "n_fringes", "deg",
    "coherent_raw", "pol_beta_deg"))
def _image_only(
    sf: jnp.ndarray,
    probing_depth: jnp.ndarray,
    *,
    diagnostic: str = "shadowgraphy",
    probing_direction: str = "z",
    bins: Tuple[int, int] = (431, 321),
    lwl: float = 1064e-9,
    L: float = 400.0,
    R: float = 25.0,
    Lx: float = 18.0,
    Ly: float = 13.5,
    focal_plane: float = 0.0,
    coherent_convention: str = "legacy",
    detL: float | None = None,
    n_fringes: float = 10.0,
    deg: float = 20.0,
    coherent_raw: bool = False,
    pol_beta_deg: float = 85.0,
):
    """(9, Np) exit state -> optics -> detector, as one jitted program.

    The detector stage of the segment-STREAMED path (the trace itself
    runs as per-segment programs in tracer.zscan.
    solve_zscan_segments_streamed, so it cannot be fused here).
    """
    return _image_from_sf(
        sf, probing_depth, diagnostic=diagnostic,
        probing_direction=probing_direction, bins=bins, lwl=lwl, L=L, R=R,
        Lx=Lx, Ly=Ly, focal_plane=focal_plane,
        coherent_convention=coherent_convention, detL=detL,
        n_fringes=n_fringes, deg=deg, coherent_raw=coherent_raw,
        pol_beta_deg=pol_beta_deg)


def _pad_ray_cols(s0: jnp.ndarray, multiple: int, a_ax: int,
                  b_ax: int) -> jnp.ndarray:
    """Pad a (9, Np) bundle up to a multiple of ``multiple`` rays.

    Pad rays are copies of ray 0 displaced to 1e9 m transverse: they
    free-fly outside the grid (interp fill value 0) and land outside every
    detector bin, so the padded image is exactly the unpadded one.
    """
    Np = s0.shape[1]
    total = -(-Np // multiple) * multiple
    if total == Np:
        return s0
    pad = jnp.repeat(s0[:, :1], total - Np, axis=1)
    pad = pad.at[a_ax].set(1e9).at[b_ax].set(1e9)
    return jnp.concatenate([s0, pad], axis=1)


def finalize_coherent(images, diagnostic, convention: str = "legacy"):
    """Finalize raw coherent accumulators from ``coherent_raw=True`` runs.

    ``images`` is one array or a tuple matching ``diagnostic`` (one name
    or a tuple of names); coherent entries are (ny, nx, C) field-sum
    accumulators and become detector images, incoherent entries pass
    through. Sum raw results across ray batches / campaign chunks first,
    then call this exactly once — the result is bit-comparable to a
    single program over all rays.
    """
    from synthpy_tpu.ops.histogram import finalize_complex

    if isinstance(diagnostic, str):
        if BENCHES[diagnostic][1]:
            return finalize_complex(images, convention)
        return images
    return tuple(
        finalize_complex(img, convention) if BENCHES[n][1] else img
        for n, img in zip(diagnostic, images))


def run(
    domain: ScalarDomain,
    s0: jnp.ndarray,
    *,
    diagnostic: str = "shadowgraphy",
    solver: str = "zscan",
    lwl: float = 1064e-9,
    n_steps: Optional[int] = None,
    steps_per_cell: float = 1.0,
    probing_depth: Optional[float] = None,
    pack: Optional[TracePack] = None,
    zpack=None,
    spack=None,
    bins: Tuple[int, int] = (431, 321),
    ray_chunk: Optional[int] = None,
    critical_guard: Optional[float] = 0.85,
    mesh=None,
    ray_axis: str = "rays",
    grid_axis: Optional[str] = None,
    pp_axis: Optional[str] = None,
    **bench_kwargs,
) -> jnp.ndarray:
    """Convenience wrapper: pack the domain and run the fused pipeline.

    Pass a prebuilt ``zpack`` (make_zscan_pack) or ``spack``
    (make_segment_pack) to amortise pack construction across calls.

    ``diagnostic`` may be a list/tuple of names: the bundle is traced
    ONCE and every requested bench/detector is synthesised from the same
    exit state; returns a dict {name: image}.

    ``critical_guard``: if a z-scan solver is requested but
    max(ne)/nc >= this fraction, fall back to the general time-domain
    tracer (which handles turning points / reflection physically) with a
    warning. The z-scan reparameterisation divides by v_p and is
    ill-conditioned near critical surfaces. None disables the check; it
    is skipped automatically when ``domain.ne`` has been freed (prebuilt
    packs) — the caller owns the check in that case.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``ray_axis`` axis. The
    bundle is padded (with off-grid, off-detector rays — image-exact) to
    a multiple of the axis size and split across it; the field pack is
    replicated; GSPMD partitions the fused trace+optics+detector program
    so each device traces its ray shard and the detector scatter-add is
    reduced with one psum over ICI. This is the one-call replacement for
    the reference's MPI flow (rank-split bundles + comm.reduce of
    histograms, pvti_trace_mpi.py:144-170).

    ``grid_axis``: name of a mesh axis to shard the FIELD over instead of
    replicating it (zscan_seg only): the segment tables are split along
    the transverse a-axis and traced with
    :func:`~synthpy_tpu.parallel.make_gridsharded_segment_tracer` (halo
    ppermute + ownership psum, bit-identical to single-device) — >HBM
    fields on the fast path in one call. If no ``spack`` is passed, the
    pack is built sharded via ``build_segment_pack_device(mesh=)``
    (``pack_dtype=`` kwarg selects the tier). Compose with ``ray_axis``
    on a 2-D mesh for throughput; a mesh without a ray axis replicates
    rays (capacity-only sharding).

    ``pp_axis``: name of a mesh axis to PIPELINE the march over by
    probing depth (zscan_seg only, exclusive with ``grid_axis``): the
    segment tables are sharded by depth and ray chunks stream
    device-to-device (``parallel.make_pipelined_segment_tracer``) — the
    capacity lever when the pack exceeds one HBM but the field is not
    transversely shardable. ``pp_chunks`` (default: the axis size) sets
    the chunk count; segment counts that don't divide the axis are
    padded with zero segments the tracer skips (bit-exact).

    ``pack_dtype`` for both mesh modes defaults to float32 — ``mesh=``
    is a pure distribution knob at the single-device accuracy class
    (coherent images resolve bf16 pack rounding that incoherent binning
    hides); pass jnp.bfloat16 / jnp.int8 / "int4" to opt into the tiers.
    """
    from synthpy_tpu.tracer.propagator import default_n_steps

    multi = isinstance(diagnostic, (list, tuple))
    diagnostic = tuple(diagnostic) if multi else diagnostic

    def _out(res):
        return dict(zip(diagnostic, res)) if multi else res

    if (critical_guard is not None
            and solver in ("zscan", "zscan_seg", "analytic")
            and domain.ne is not None):
        frac = peak_ne_over_nc(domain, lwl)
        if frac >= critical_guard:
            import warnings

            dropped = [k for k in ("integrator", "seg_weights", "seg_cache",
                                   "pack_dtype") if k in bench_kwargs]
            warnings.warn(
                f"max(ne)/nc = {frac:.3f} >= {critical_guard}: z-scan "
                "solvers are ill-conditioned near critical density; "
                "falling back to solver='time'"
                + (f" (dropping {', '.join(dropped)})" if dropped else "")
                + ".", stacklevel=2)
            solver = "time"
            for k in dropped:
                bench_kwargs.pop(k)

    grid_mode = mesh is not None and grid_axis is not None
    pp_mode = mesh is not None and pp_axis is not None
    if grid_mode and solver != "zscan_seg":
        raise ValueError("grid_axis requires solver='zscan_seg' (the "
                         "grid-sharded march is the segmented fast path)")
    if pp_mode and (grid_mode or solver != "zscan_seg"):
        raise ValueError("pp_axis requires solver='zscan_seg' and is "
                         "mutually exclusive with grid_axis (the PP "
                         "tracer shards segments by probing depth)")
    if (solver == "zscan_seg" and spack is None and not grid_mode
            and not pp_mode and "pack_dtype" in bench_kwargs):
        # single-device tier selection (mesh modes resolve pack_dtype in
        # their own branches below): build the segment pack directly at
        # the requested tier; "auto" picks it from the field's measured
        # caustic-ness envelope and warns what it chose
        import warnings

        from synthpy_tpu.tracer.zscan import (PACK_DTYPES, PackTierAdvice,
                                              build_segment_pack_device,
                                              suggest_pack_dtype)

        pdt = bench_kwargs.pop("pack_dtype")
        dith = bench_kwargs.pop("pack_dither", None)
        if pdt == "auto":
            adv = suggest_pack_dtype(domain, lwl)
            integ = bench_kwargs.get("integrator", "rk4")
            if adv["dtype"] == "int4" and integ not in ("rk2s2", "rk2s4"):
                # int4 nibble packs need even-stride integrators; int8 is
                # the accuracy-safe tier at any integrator
                adv = dict(adv, dtype=jnp.int8, name="int8(int4 needs "
                           f"rk2s2/rk2s4, integrator={integ})")
            warnings.warn(
                f"pack_dtype='auto': chose {adv['name']} tier "
                f"(caustic metric chi={adv['chi']}, estimated raw image "
                f"rel-L1 {adv['est_rel_err']}, dither={adv['dither']})",
                PackTierAdvice, stacklevel=2)
            pdt, dith = adv["dtype"], adv["dither"]
        elif isinstance(pdt, str):
            pdt = PACK_DTYPES[pdt]
        n_p = (domain.x, domain.y, domain.z)[
            _AXIS_OF[domain.probing_direction]].shape[0]
        K_eff = min(bench_kwargs.get("seg_K", 64), n_p - 1)
        if pdt == "int4" and K_eff % 2:
            K_eff += 1  # nibble packs pair planes; pads one zero slab
        spack = build_segment_pack_device(domain, lwl=lwl, K=K_eff,
                                          dtype=pdt, dither=dith)
    if (pack is None and zpack is None and spack is None
            and solver != "analytic" and not grid_mode and not pp_mode):
        pack = build_pack(domain, lwl)
    elif pack is None and solver == "time":
        pack = build_pack(domain, lwl)
    if probing_depth is None:
        probing_depth = domain.extent
    layout = layout_of(domain)
    s0 = jnp.asarray(s0)
    depth = jnp.asarray(probing_depth, s0.dtype)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        p_ax = _AXIS_OF[domain.probing_direction]
        a_ax, b_ax = [a for a in range(3) if a != p_ax]
        if ray_axis in mesh.shape and not pp_mode:
            s0 = _pad_ray_cols(s0, mesh.shape[ray_axis], a_ax, b_ax)
            s0 = jax.device_put(s0, NamedSharding(mesh, P(None, ray_axis)))
        elif not grid_mode and not pp_mode:
            raise ValueError(f"mesh has no '{ray_axis}' axis; pass "
                             f"grid_axis= for field-sharded tracing or "
                             f"pp_axis= for depth-pipelined tracing")
        _repl_sharding = NamedSharding(mesh, P())

        def _repl(x):
            return jax.device_put(x, _repl_sharding)
    else:
        def _repl(x):
            return x

    seg_K = bench_kwargs.pop("seg_K", 64)
    batch_pack_bytes = bench_kwargs.pop("batch_pack_bytes", 4 << 30)
    batch_corner_bytes = bench_kwargs.pop("batch_corner_bytes", 1 << 30)

    # host-resident SegmentPack (build_segment_pack_streaming(device=False)):
    # stream segments through the device — packs larger than HBM run on one
    # chip at full physics (the reference's auto-batching analogue, as
    # per-segment device programs instead of host slab regeneration)
    import numpy as _np
    if (solver == "zscan_seg" and spack is not None
            and isinstance(spack.seg_planes, _np.ndarray)):
        if mesh is not None:
            raise ValueError("streamed host packs are single-device; "
                             "pass a device spack for mesh mode")
        from synthpy_tpu.tracer.zscan import solve_zscan_segments_streamed

        integrator = bench_kwargs.pop("integrator", "rk4")
        res = solve_zscan_segments_streamed(
            s0, domain, probing_depth, hpack=spack, lwl=lwl,
            substeps=max(int(round(steps_per_cell)), 1),
            ray_chunk=ray_chunk, integrator=integrator,
            weights=bench_kwargs.pop("seg_weights", "stage"),
            cache=bench_kwargs.pop("seg_cache", None))
        return _out(_image_only(
            res.sf, depth, diagnostic=diagnostic,
            probing_direction=domain.probing_direction, bins=bins,
            lwl=lwl, **bench_kwargs))

    if solver == "analytic":
        # pack-free closed-form march (tracer.analytic): no field table is
        # ever built — the RHS evaluates domain.analytic closures at each
        # RK stage. Zero pack-build latency and zero gather traffic; the
        # march is pure VPU math and the field is grid-free exact.
        from synthpy_tpu.tracer.analytic import solve_zscan_analytic

        res = solve_zscan_analytic(
            s0, domain, probing_depth, lwl=lwl, n_steps=n_steps,
            integrator=bench_kwargs.pop("integrator", "rk2"),
            ray_chunk=ray_chunk)
        return _out(_image_only(
            res.sf, depth, diagnostic=diagnostic,
            probing_direction=domain.probing_direction, bins=bins,
            lwl=lwl, **bench_kwargs))

    if solver in ("zscan", "zscan_seg"):
        if solver == "zscan_seg":
            if pp_mode:
                # depth-pipelined march: segments sharded over pp_axis,
                # ray chunks streamed device-to-device (ppermute). The
                # capacity lever when the PACK exceeds one HBM but the
                # field is not transversely shardable (or compile-time
                # favors depth cuts). Segment count is padded to the
                # axis size with zero segments that the tracer SKIPS
                # (n_seg_real) — bit-exact: even marching zero field
                # would accumulate one f32 rounding per slab in the
                # position columns.
                from synthpy_tpu.parallel.pipeline_pp import (
                    make_pipelined_segment_tracer)
                from synthpy_tpu.tracer.zscan import (
                    build_segment_pack_device, reassemble_state)

                pack_dtype = bench_kwargs.pop("pack_dtype", jnp.float32)
                # f32 default: mesh= is a pure DISTRIBUTION knob at
                # the single-device accuracy class (the coherent
                # phase column resolves bf16-vs-f32 pack rounding
                # that incoherent binning hides); opt into the
                # bf16/int8/int4 tiers via pack_dtype=
                if spack is None:
                    spack = build_segment_pack_device(
                        domain, lwl=lwl, K=seg_K, dtype=pack_dtype)
                D = mesh.shape[pp_axis]
                n_seg = spack.seg_planes.shape[0]
                n_seg_pad = -(-n_seg // D) * D
                if n_seg_pad != n_seg:
                    seg_planes = jnp.pad(
                        spack.seg_planes,
                        ((0, n_seg_pad - n_seg), (0, 0), (0, 0)))
                    scales = getattr(spack, "scales", None)
                    if scales is not None:
                        scales = jnp.pad(
                            scales, ((0, n_seg_pad - n_seg), (0, 0),
                                     (0, 0)), constant_values=1.0)
                    spack = spack._replace(seg_planes=seg_planes,
                                           scales=scales)
                u = jnp.stack([s0[a_ax], s0[b_ax], s0[3 + a_ax],
                               s0[3 + b_ax], s0[3 + p_ax], s0[6], s0[7],
                               s0[8]], axis=1)
                Np = u.shape[0]
                n_chunks = int(bench_kwargs.pop("pp_chunks", D))
                if n_chunks % D:
                    raise ValueError(f"pp_chunks {n_chunks} must be a "
                                     f"multiple of the {D}-way "
                                     f"'{pp_axis}' axis")
                chunk_rays = -(-Np // n_chunks)
                total = n_chunks * chunk_rays
                if total != Np:
                    # pad rows are sliced off again before the detector
                    u = jnp.concatenate(
                        [u, jnp.repeat(u[:1], total - Np, axis=0)], 0)
                chunks = u.reshape(n_chunks, chunk_rays, 8)
                tracer = make_pipelined_segment_tracer(
                    mesh, layout, spack, n_chunks=n_chunks, axis=pp_axis,
                    substeps=max(int(round(steps_per_cell)), 1),
                    integrator=bench_kwargs.pop("integrator", "rk4"),
                    weights=bench_kwargs.pop("seg_weights", "stage"),
                    n_seg_real=n_seg)
                dp = jnp.asarray(spack.dp, u.dtype)
                if getattr(spack, "scales", None) is not None:
                    uf = tracer(chunks, spack.seg_planes, spack.scales,
                                spack.origin_ab, spack.inv_spacing_ab, dp)
                else:
                    uf = tracer(chunks, spack.seg_planes,
                                spack.origin_ab, spack.inv_spacing_ab, dp)
                uf = uf.reshape(total, 8)[:Np]
                # pad segments are skipped (n_seg_real), so the march
                # really ends at the REAL segment count's exit plane
                sf = reassemble_state(
                    uf, spack.p0 + n_seg * spack.K * spack.dp,
                    domain.probing_direction)
                return _out(_image_only(
                    sf, depth, diagnostic=diagnostic,
                    probing_direction=domain.probing_direction, bins=bins,
                    lwl=lwl, **bench_kwargs))
            if grid_mode:
                # field-sharded march: the spack (built sharded via
                # build_segment_pack_device(mesh=), or any single-device
                # pack — GSPMD reshards at the jit boundary) is SPLIT
                # along the transverse a-axis instead of replicated, so
                # >HBM fields trace multi-chip on the fast path in one
                # call. Composes with a ray axis on a 2-D mesh.
                from synthpy_tpu.parallel.mesh import (
                    make_gridsharded_segment_tracer)
                from synthpy_tpu.tracer.zscan import (
                    build_segment_pack_device, reassemble_state)

                pack_dtype = bench_kwargs.pop("pack_dtype", jnp.float32)
                # f32 default: mesh= is a pure DISTRIBUTION knob at
                # the single-device accuracy class (the coherent
                # phase column resolves bf16-vs-f32 pack rounding
                # that incoherent binning hides); opt into the
                # bf16/int8/int4 tiers via pack_dtype=
                G = mesh.shape[grid_axis]
                if spack is None:
                    p_dims = list(domain.dims)
                    del p_dims[p_ax]
                    # sharded build needs na % G == 0; otherwise build on
                    # one device and pad below (GSPMD reshards at the jit
                    # boundary)
                    build_mesh = mesh if p_dims[0] % G == 0 else None
                    spack = build_segment_pack_device(
                        domain, lwl=lwl, K=seg_K, mesh=build_mesh,
                        mesh_axis=grid_axis, dtype=pack_dtype)
                r_ax = ray_axis if ray_axis in mesh.shape else None
                n_seg = spack.seg_planes.shape[0]
                na, nb = spack.shape_ab
                na_pad = -(-na // G) * G
                tracer = make_gridsharded_segment_tracer(
                    mesh, layout, spack, grid_axis=grid_axis,
                    ray_axis=r_ax,
                    substeps=max(int(round(steps_per_cell)), 1),
                    integrator=bench_kwargs.pop("integrator", "rk4"),
                    weights=bench_kwargs.pop("seg_weights", "stage"),
                    table_na=na_pad)
                tables = spack.seg_planes.reshape(
                    n_seg, na, nb, spack.seg_planes.shape[-1])
                if na_pad != na:
                    # EXACT zero-row padding: the march's inside-mask and
                    # corner clip stay bounded by the REAL na (shape_ab),
                    # so pad rows are never owned or interpolated —
                    # non-power-of-two .pvti/FLASH fields shard without
                    # constraint (quantised packs too: zero rows decode
                    # to exact zeros)
                    tables = jnp.pad(
                        tables, ((0, 0), (0, na_pad - na), (0, 0), (0, 0)))
                u = jnp.stack([s0[a_ax], s0[b_ax], s0[3 + a_ax],
                               s0[3 + b_ax], s0[3 + p_ax], s0[6], s0[7],
                               s0[8]], axis=1)
                uf = tracer(u, tables, spack.origin_ab,
                            spack.inv_spacing_ab,
                            jnp.asarray(spack.dp, u.dtype))
                sf = reassemble_state(uf, spack.p0 + n_seg * spack.K
                                      * spack.dp, domain.probing_direction)
                return _out(_image_only(
                    sf, depth, diagnostic=diagnostic,
                    probing_direction=domain.probing_direction, bins=bins,
                    lwl=lwl, **bench_kwargs))
            if spack is None:
                zp = zpack or make_zscan_pack(pack, layout,
                                              domain.probing_direction)
                spack = make_segment_pack(
                    zp, K=min(seg_K, zp.planes.shape[0] - 1))
            n_slabs = spack.seg_planes.shape[0] * spack.K

            _scales = getattr(spack, "scales", None)
            _qbits = getattr(spack, "qbits", None)

            def _call(s_batch, rc):
                return synth_image_zscan(
                    s_batch, _repl(spack.seg_planes),
                    _repl(spack.origin_ab), _repl(spack.inv_spacing_ab),
                    depth, layout=layout, n_slabs=n_slabs, p0=spack.p0,
                    dp_static=spack.dp,
                    seg_scales=(None if _scales is None
                                else _repl(_scales)),
                    seg_qbits=_qbits,
                    substeps=max(int(round(steps_per_cell)), 1),
                    diagnostic=diagnostic, segmented=True, seg_K=spack.K,
                    shape_ab=spack.shape_ab,
                    probing_direction=domain.probing_direction, bins=bins,
                    ray_chunk=rc, lwl=lwl, **bench_kwargs)

            pack_bytes = spack.seg_planes.size * spack.seg_planes.dtype.itemsize
            # hoisted corner bytes/ray: 4 rows of the table, whatever its
            # dtype/packing (int8 halves this vs bf16, int4 quarters it)
            per_ray = (4 * spack.seg_planes.shape[-1]
                       * spack.seg_planes.dtype.itemsize)
            if mesh is None and pack_bytes > batch_pack_bytes:
                # HBM-pressure regime (1024^3-class packs): in-program ray
                # chunking (lax.map) does not compile over multi-GB packs
                # on this runtime, and a single oversized program OOMs.
                # Fall back to per-CALL batching: pad the bundle so every
                # batch shares one compiled shape, trace batch-by-batch,
                # sum the images. Incoherent detectors are linear in rays;
                # coherent ones are accumulated as RAW per-pixel field
                # sums (coherent_raw) and finalized once at the end, so
                # cross-batch interference is retained EXACTLY — unlike
                # the reference's per-rank MPI image reduction
                # (interference_MPI.py:190-204).
                max_rays = max(int(batch_corner_bytes // per_ray), 1024)
                if s0.shape[1] > max_rays:
                    names = ((diagnostic,) if isinstance(diagnostic, str)
                             else diagnostic)
                    user_raw = bench_kwargs.get("coherent_raw", False)
                    any_coh = any(BENCHES[n][1] for n in names)
                    if any_coh:
                        bench_kwargs["coherent_raw"] = True
                    p_ax = _AXIS_OF[domain.probing_direction]
                    a_ax, b_ax = [a for a in range(3) if a != p_ax]
                    s_pad = _pad_ray_cols(s0, max_rays, a_ax, b_ax)
                    acc = None
                    for i0 in range(0, s_pad.shape[1], max_rays):
                        res = _call(s_pad[:, i0:i0 + max_rays], None)
                        if acc is None:
                            acc = res
                        elif isinstance(res, tuple):
                            acc = tuple(a + b for a, b in zip(acc, res))
                        else:
                            acc = acc + res
                    if any_coh and not user_raw:
                        conv = bench_kwargs.get("coherent_convention",
                                                "legacy")
                        acc = finalize_coherent(acc, diagnostic, conv)
                    return _out(acc)
                # single small batch: one plain program — but honor an
                # EXPLICIT user chunk size (they may be dodging a compile
                # OOM the auto heuristic misjudges)
            elif ray_chunk is None and mesh is None:
                # Under a mesh, HBM pressure is divided across devices and
                # in-program chunking would fight GSPMD's ray partition.
                from synthpy_tpu.tracer.zscan import _auto_ray_chunk

                ray_chunk = _auto_ray_chunk(spack)
            return _out(_call(s0, ray_chunk))
        zp = zpack or make_zscan_pack(pack, layout,
                                      domain.probing_direction)
        return _out(synth_image_zscan(
            s0, _repl(zp.planes), _repl(zp.origin_ab),
            _repl(zp.inv_spacing_ab), depth,
            layout=layout, n_slabs=zp.planes.shape[0] - 1, p0=zp.p0,
            dp_static=zp.dp, substeps=max(int(round(steps_per_cell)), 1),
            diagnostic=diagnostic,
            probing_direction=domain.probing_direction, bins=bins,
            ray_chunk=ray_chunk, lwl=lwl, **bench_kwargs))

    if n_steps is None:
        n_steps = default_n_steps(domain, probing_depth, steps_per_cell)
    s_rows = s0.T
    dt = jnp.asarray(jnp.sqrt(8.0) * probing_depth / C / n_steps,
                     dtype=s_rows.dtype)
    return _out(synth_image(
        s_rows, _repl(pack.channels), _repl(pack.origin),
        _repl(pack.inv_spacing), dt, depth,
        layout=layout, n_steps=n_steps, diagnostic=diagnostic,
        probing_direction=domain.probing_direction, bins=bins,
        ray_chunk=ray_chunk, lwl=lwl, **bench_kwargs))


def run_split(
    domain: ScalarDomain,
    s0: jnp.ndarray,
    *,
    lwl: float = 1064e-9,
    critical_frac: float = 0.85,
    margin_cells: int = 4,
    pad_to: int = 65536,
    **kwargs,
):
    """Mixed-bundle solve for fields with LOCALIZED overcritical regions.

    The critical-density guard in :func:`run` is all-or-nothing: one
    overcritical filament forces the whole bundle onto the slow
    time-domain tracer. ``run_split`` routes rays individually: the
    electron density is reduced to a transverse map of its maximum along
    the probing axis, dilated by ``margin_cells`` (paraxial rays drift
    ~1e-3 cells per slab, so a few cells of margin is generous); rays
    whose entry column stays below ``critical_frac * nc`` trace on the
    fast z-scan path, the rest on the general time tracer (which
    reflects at ne = nc). The two detector histograms add exactly
    (incoherent counts and coherent complex sums are both linear in
    rays). No reference equivalent — it silently mis-traces overcritical
    fields.

    Each partition is padded up to a multiple of ``pad_to`` rays (pad
    rays enter at 1e9 m transverse: they free-fly outside the grid and
    fall outside every detector), so repeated calls reuse at most a few
    compiled program shapes.

    Coherent diagnostics: partition images are per-pixel AMPLITUDES (the
    reference's histogram_legacy convention), so adding them drops
    cross-partition interference — the same approximation the reference
    makes when MPI-summing per-rank interferograms
    (interference_MPI.py:190-204). Additionally the two integrators
    accumulate hundreds of radians of phase and differ at the ~1e-3
    level, so mixed-bundle fringe patterns are solver-sensitive;
    run_split warns and quantitative coherent work on overcritical
    fields should use solver="time" for the whole bundle.

    Returns the same type as :func:`run` (image, or dict for a
    multi-diagnostic tuple).
    """
    import numpy as np

    from synthpy_tpu import constants

    diag = kwargs.get("diagnostic", "shadowgraphy")
    names = (diag,) if isinstance(diag, str) else tuple(diag)
    any_coh = any(DIAGNOSTICS[nm][2] for nm in names)
    user_raw = kwargs.get("coherent_raw", False)
    if any_coh:
        import warnings

        # cross-partition interference IS retained (raw field-sum
        # accumulation, finalized once) — but the two integrators differ
        # at the ~1e-3 phase level over hundreds of radians, so fringes
        # near the fast/slow partition boundary are solver-sensitive
        warnings.warn(
            "run_split mixes z-scan and time-tracer phases in one "
            "coherent sum; fringes involving both partitions are "
            "solver-sensitive at the integrator-mismatch level. Use "
            "solver='time' on the full bundle for quantitative coherent "
            "work.", stacklevel=2)
        kwargs["coherent_raw"] = True

    if domain.ne is None:
        raise RuntimeError("run_split needs the domain's ne grid")
    nc = float(constants.critical_density(constants.omega_from_lwl(lwl)))
    p_ax = _AXIS_OF[domain.probing_direction]
    a_ax, b_ax = [a for a in range(3) if a != p_ax]

    @jax.jit
    def column_mask(ne):
        col = jnp.max(ne, axis=p_ax)  # (na, nb) transverse max
        m = margin_cells
        col = jax.lax.reduce_window(
            col, -jnp.inf, jax.lax.max,
            window_dimensions=(2 * m + 1, 2 * m + 1),
            window_strides=(1, 1), padding="SAME")
        return col >= critical_frac * nc

    mask = np.asarray(column_mask(domain.ne))
    coords = (domain.x, domain.y, domain.z)
    ca = np.asarray(coords[a_ax])
    cb = np.asarray(coords[b_ax])
    s_np = np.asarray(s0)
    ia = np.clip(np.rint((s_np[a_ax] - ca[0]) / (ca[1] - ca[0])
                         ).astype(np.int64), 0, len(ca) - 1)
    ib = np.clip(np.rint((s_np[b_ax] - cb[0]) / (cb[1] - cb[0])
                         ).astype(np.int64), 0, len(cb) - 1)
    slow = mask[ia, ib]

    def _pad(cols):
        n = cols.shape[1]
        if n == 0:
            return None
        total = -(-n // pad_to) * pad_to
        if total == n:
            return jnp.asarray(cols)
        pad = np.repeat(cols[:, :1], total - n, axis=1)
        pad[a_ax] = 1e9       # off-grid, off-detector
        pad[b_ax] = 1e9
        return jnp.asarray(np.concatenate([cols, pad], axis=1))

    fast = _pad(s_np[:, ~slow])
    slow_rays = _pad(s_np[:, slow])

    out = None
    if fast is not None:
        out = run(domain, fast, solver="zscan_seg", lwl=lwl,
                  critical_guard=None, **kwargs)
    if slow_rays is not None:
        out_t = run(domain, slow_rays, solver="time", lwl=lwl,
                    critical_guard=None, **kwargs)
        if out is None:
            out = out_t
        elif isinstance(out, dict):
            out = {k: out[k] + out_t[k] for k in out}
        else:
            out = out + out_t
    if any_coh and not user_raw and out is not None:
        conv = kwargs.get("coherent_convention", "legacy")
        if isinstance(out, dict):
            out = dict(zip(diag, finalize_coherent(
                tuple(out[nm] for nm in diag), tuple(diag), conv)))
        else:
            out = finalize_coherent(out, diag, conv)
    return out
