"""CLI ray-trace driver (parity: examples/jobs/run_scripts/
test_SynthRayTrace.py:1-101 and pvti_trace_mpi.py).

Usage:
    python -m synthpy_tpu.cli.trace -d 128 -r 100000 [-p z] [-s 1.0]
        [--ne-type test_exponential_cos | --pvti FILE]
        [--diagnostic shadowgraphy] [--solver zscan|time]
        [-o out_prefix] [--seed 0]

Builds the domain (analytic profile or .pvti field), initialises a
circular beam, traces, runs the requested diagnostic, and writes the
detector image (.npz) plus optional exit rays (.npy).
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--domain", type=int, default=128,
                   help="grid cells per axis")
    p.add_argument("-r", "--rays", type=float, default=1e5,
                   help="number of rays")
    p.add_argument("-l", "--length", type=float, default=10e-3,
                   help="domain edge length [m]")
    p.add_argument("-p", "--probing", default="z", choices="xyz")
    p.add_argument("-s", "--steps-per-cell", type=float, default=1.0)
    p.add_argument("--lwl", type=float, default=1064e-9,
                   help="probe wavelength [m]")
    p.add_argument("--ne-type", default="test_exponential_cos",
                   help="analytic profile name (see ScalarDomain)")
    p.add_argument("--pvti", default=None,
                   help="load n_e from a .pvti file instead")
    p.add_argument("--beam", default="circular")
    p.add_argument("--beam-size", type=float, default=None,
                   help="beam radius [m]; default 0.4 * half-extent")
    p.add_argument("--divergence", type=float, default=0.0)
    p.add_argument("--diagnostic", default="shadowgraphy",
                   help="shadowgraphy | shadowgraphy_single | schlieren_df"
                        " | schlieren_lf | refractometry"
                        " | refractometry_coherent | interferometry | none;"
                        " a comma-separated list synthesises every named"
                        " bench from ONE trace")
    p.add_argument("--solver", default="zscan_seg",
               choices=("zscan_seg", "zscan", "time", "analytic"),
               help="zscan_seg (segmented fast path) | zscan | time "
                    "(general) | analytic (pack-free closed-form march "
                    "for --ne-type fields: zero pack build, grid-free "
                    "exact field)")
    p.add_argument("--bin-scale", type=int, default=8)
    p.add_argument("--pack-dtype", default="bf16",
                   choices=("bf16", "f32", "int8", "int4"),
                   help="segment-table dtype for --solver zscan_seg "
                        "(int8 = quantised fast tier, image-equivalence"
                        "-gated; int4 = nibble-packed tier, requires "
                        "--integrator rk2s2 or rk2s4)")
    p.add_argument("--integrator", default="rk4",
                   choices=("rk4", "rk2", "rk2s2", "rk2s4"),
                   help="zscan_seg slab integrator: rk4 (reference parity),"
                        " rk2 (midpoint; ~1.4x faster on TPU), rk2s2"
                        " (stride-2 midpoint; ~2x; both oracle-validated)"
                        " or rk2s4 (stride-4; image-equivalence tier)")
    p.add_argument("--plane-stride", type=int, default=1,
                   help="keep every Nth field plane in the segment pack "
                        "(gradients still computed at full resolution): "
                        "rk2s2 on a stride-2 pack is BIT-identical to "
                        "rk2s4 on the full pack at half the gather "
                        "bytes/ray. zscan_seg only; the effective step "
                        "is plane_stride x the integrator stride")
    p.add_argument("--pack-dither", type=int, default=None,
                   help="dither seed for quantised packs (int8/int4): "
                        "decorrelates rounding error into a zero-mean "
                        "walk — measured 12x smaller caustic exit RMS "
                        "at no march cost; same seed = bit-identical "
                        "pack")
    p.add_argument("--mesh", default=None,
                   help="device-mesh spec 'axis=N[,axis=N]', e.g. "
                        "'rays=8' (data-parallel rays + psum'd detector) "
                        "or 'grid=4,rays=2' (field sharded over the grid "
                        "axis, zscan_seg only): the one-command "
                        "replacement for the reference's mpiexec flow "
                        "(simTraceMPI.sh:14, pvti_trace_mpi.py:144-170). "
                        "Needs a --diagnostic (the image is the reduced "
                        "output)")
    p.add_argument("--grid-axis", default=None,
                   help="mesh axis to shard the FIELD over (default: "
                        "'grid' when the --mesh spec names one)")
    p.add_argument("--pp-axis", default=None,
                   help="mesh axis to PIPELINE the march over by probing "
                        "depth (zscan_seg; exclusive with --grid-axis): "
                        "e.g. --mesh seg=8 --pp-axis seg streams ray "
                        "chunks through depth-sharded segment tables — "
                        "the capacity mode when the PACK exceeds one HBM")
    p.add_argument("--phaseshift", action="store_true")
    p.add_argument("-o", "--output", default=None,
                   help="output prefix (writes <prefix>.npz)")
    p.add_argument("--save-rays", default=None,
                   help="write exit rays to this .npy")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.io import read_pvti, save_histograms, save_rays
    from synthpy_tpu.tracer import init_beam, solve
    from synthpy_tpu.tracer.zscan import solve_zscan

    t0 = time.perf_counter()
    if args.pvti:
        ne, shape, spacing = read_pvti(args.pvti)
        lengths = tuple(shape[i] * spacing[i] for i in range(3))
        domain = ScalarDomain(lengths, shape,
                              probing_direction=args.probing)
        domain.external_ne(ne)
    else:
        domain = ScalarDomain(args.length, args.domain,
                              ne_type=args.ne_type,
                              probing_direction=args.probing)
    if (args.integrator != "rk4"
            and args.solver not in ("zscan_seg", "analytic")):
        raise SystemExit("--integrator rk2 requires --solver zscan_seg "
                         "or analytic (other solvers are rk4-only)")
    if args.solver == "analytic" and args.integrator in ("rk2s2", "rk2s4"):
        raise SystemExit("analytic solver integrators: rk2 | rk4 (plane "
                         "strides are gridded-pack concepts; lower "
                         "--steps via -s instead)")
    diags = tuple(d.strip() for d in args.diagnostic.split(",") if d.strip())
    coherent = any(d in ("interferometry", "refractometry_coherent")
                   for d in diags)
    domain.phaseshift = args.phaseshift or coherent

    ext = domain.extent
    beam_size = args.beam_size or 0.4 * ext
    s0 = init_beam(jax.random.PRNGKey(args.seed), int(args.rays), beam_size,
                   args.divergence, ext, args.beam, args.probing)

    mesh = None
    grid_axis = None
    if args.mesh:
        from synthpy_tpu.parallel.mesh import mesh_from_spec
        from synthpy_tpu.parallel.multihost import initialize

        if args.diagnostic == "none":
            raise SystemExit("--mesh needs a --diagnostic (the reduced "
                             "detector image is the multi-chip output)")
        # no-op on a single host; on a multi-process job (TPU pod/SLURM/
        # mpiexec env markers) connects the hosts so jax.devices() is the
        # GLOBAL device set the mesh spec addresses
        initialize()
        try:
            mesh, grid_axis = mesh_from_spec(args.mesh, args.grid_axis,
                                             args.pp_axis)
        except ValueError as e:
            raise SystemExit(str(e))
        if args.pp_axis and grid_axis:
            raise SystemExit("--pp-axis and --grid-axis are mutually "
                             "exclusive")
        if args.pp_axis and args.solver != "zscan_seg":
            raise SystemExit("--pp-axis requires --solver zscan_seg")

    ps = args.plane_stride
    if ps != 1 and args.solver != "zscan_seg":
        raise SystemExit("--plane-stride requires --solver zscan_seg")
    if ps != 1 and args.integrator == "rk4":
        raise SystemExit("--plane-stride needs an even-stride integrator "
                         "(rk2/rk2s2/rk2s4): rk4 blends mid-slab planes "
                         "the decimated pack no longer holds exactly")
    if (args.pack_dither is not None
            and args.pack_dtype not in ("int8", "int4")):
        raise SystemExit("--pack-dither applies to --pack-dtype "
                         "int8 or int4")
    spack = None
    if args.solver == "zscan_seg" and (args.pack_dtype != "bf16"
                                       or ps != 1):
        from synthpy_tpu.tracer.zscan import (PACK_DTYPES,
                                              build_segment_pack_device)
        if args.pack_dtype == "int4":
            if args.integrator not in ("rk2s2", "rk2s4"):
                raise SystemExit("--pack-dtype int4 requires --integrator "
                                 "rk2s2 or rk2s4 (nibble pairs align to "
                                 "even plane strides)")
            stride = (2 if args.integrator == "rk2s2" else 4) * ps
            K = min(64, (domain.dims[0] - 1) // stride * stride)
        else:
            K = min(64, (domain.dims[0] - 1) // ps * ps)
        build_mesh = None
        if grid_axis is not None:
            # sharded build needs the transverse a-dim to divide over the
            # grid axis; otherwise build on one device — pipeline.run pads
            # the tables with zero a-rows (exact) before the sharded march
            p_ax = {"x": 0, "y": 1, "z": 2}[args.probing]
            a_dim = [domain.dims[i] for i in range(3) if i != p_ax][0]
            if a_dim % mesh.shape[grid_axis] == 0:
                build_mesh = mesh
        spack = build_segment_pack_device(
            domain, lwl=args.lwl, K=K, plane_stride=ps,
            dither=args.pack_dither,
            mesh=build_mesh, mesh_axis=grid_axis or "grid",
            dtype=PACK_DTYPES[args.pack_dtype])

    if args.diagnostic == "none":
        if args.solver == "analytic":
            from synthpy_tpu.tracer import solve_zscan_analytic
            res = solve_zscan_analytic(s0, domain, lwl=args.lwl,
                                       integrator=args.integrator)
        elif args.solver == "zscan_seg":
            from synthpy_tpu.tracer.zscan import solve_zscan_segments
            res = solve_zscan_segments(s0, domain, lwl=args.lwl,
                                       integrator=args.integrator,
                                       spack=spack)
        elif args.solver == "zscan":
            res = solve_zscan(s0, domain, lwl=args.lwl)
        else:
            res = solve(s0, domain, lwl=args.lwl)
        H = None
        trace_s = res.duration
        if args.save_rays:
            save_rays(args.save_rays, np.asarray(res.rf))
    else:
        t1 = time.perf_counter()
        extra = ({"integrator": args.integrator}
                 if args.solver in ("zscan_seg", "analytic") else {})
        if spack is not None:
            extra["spack"] = spack
        if mesh is not None:
            extra["mesh"] = mesh
            if grid_axis is not None:
                extra["grid_axis"] = grid_axis
            if args.pp_axis is not None:
                extra["pp_axis"] = args.pp_axis
        out = pipeline.run(domain, s0,
                           diagnostic=diags if len(diags) > 1 else diags[0],
                           lwl=args.lwl,
                           steps_per_cell=args.steps_per_cell,
                           solver=args.solver,
                           bins=(3448 // args.bin_scale,
                                 2574 // args.bin_scale),
                           **extra)
        if len(diags) == 1:
            out = {diags[0]: out}
        jax.block_until_ready(out)
        H = out[diags[-1]]
        trace_s = time.perf_counter() - t1
        if args.output:
            save_histograms(args.output,
                            **{k: np.asarray(v) for k, v in out.items()})

    summary = {
        "domain": domain.dims,
        "rays": int(args.rays),
        "diagnostic": args.diagnostic,
        "solver": args.solver,
        "trace_seconds": round(trace_s, 4),
        "total_seconds": round(time.perf_counter() - t0, 4),
        "image_sum": None if H is None else float(np.asarray(H).sum()),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
