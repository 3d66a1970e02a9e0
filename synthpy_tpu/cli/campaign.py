"""Config-driven production campaign runner.

Parity: the reference's production entry points are hand-edited MPI
scripts — a rank-parallel chunk loop over ``Np_ray_split`` ray bundles,
``comm.reduce(H, MPI.SUM)`` of detector histograms, pickle output
(examples/jobs/run_scripts/pvti_trace_mpi.py:22-187,
interference_MPI.py:1-218, example_ParallelisationGuide.py:33-141).
Here ONE JSON config drives the whole run:

* the chunk loop is :func:`synthpy_tpu.campaign.run_campaign`
  (checkpoint/RESUME at chunk grain — the reference has none; a killed
  48-rank PBS job restarts from zero),
* the pack is built ONCE and reused by every chunk (where the
  quantised/plane-decimated tiers earn their build cost),
* every named bench is synthesised from ONE trace per chunk
  (the reference re-traces per diagnostic, pvti_trace_mpi.py:144-170),
* coherent benches accumulate RAW per-pixel field sums across chunks and
  are finalized exactly once — cross-chunk interference is EXACT (the
  reference's MPI reduce of per-rank images drops it,
  interference_MPI.py:190-204),
* outputs are portable .npz images + a JSON summary (no pickles needed).

Usage:
    python -m synthpy_tpu.cli.campaign CONFIG.json [-o OUTDIR]
        [--total-rays N] [--chunk-rays N] [--fresh] [--quiet]

Config schema (defaults shown; every section optional except
``trace.total_rays``):

    {
      "seed": 0,
      "domain": {
        "dim": 128, "length": 10e-3, "probing": "z",
        "ne_type": "test_exponential_cos", "ne_kwargs": {},
        "pvti": null,                  # load n_e from a .pvti instead
        "phaseshift": false, "inv_brems": false,
        "Te": null, "Z": null,         # uniform values (enable inv_brems)
        "B": null                      # uniform [Bx,By,Bz] (enables B_on)
      },
      "beam": {"type": "circular", "size": null, "divergence": 0.0},
      "trace": {
        "total_rays": null, "chunk_rays": 4000000, "lwl": 1.064e-6,
        "solver": "zscan_seg", "integrator": "rk2",
        "seg_weights": "slab",
        "pack_dtype": "bf16",          # bf16 | f32 | int8 | int4
        "plane_stride": 1, "K": null,  # null = auto
        "pack_dither": null,           # int seed: dithered quantisation
        "mesh": null,                  # 'rays=8' / 'grid=4,rays=2':
        "grid_axis": null,             # multi-chip (cli.trace --mesh)
        "pp_axis": null                # depth-pipelined axis (e.g. 'seg')
      },
      "diagnostics": ["shadowgraphy"],
      "detector": {"bin_scale": 8},
      "output": {"dir": "campaign_out", "checkpoint": "checkpoint.npz",
                 "checkpoint_every": 1}
    }

Unknown keys anywhere in the config are an error (typo safety: a
misspelled "integrater" silently running rk4 for 1e8 rays is exactly the
failure mode hand-edited run scripts have).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time

DEFAULTS = {
    "seed": 0,
    "domain": {
        "dim": 128, "length": 10e-3, "probing": "z",
        "ne_type": "test_exponential_cos", "ne_kwargs": {},
        "pvti": None,
        "phaseshift": False, "inv_brems": False,
        "Te": None, "Z": None, "B": None,
    },
    "beam": {"type": "circular", "size": None, "divergence": 0.0},
    "trace": {
        "total_rays": None, "chunk_rays": 4_000_000, "lwl": 1.064e-6,
        "solver": "zscan_seg", "integrator": "rk2",
        "seg_weights": "slab",
        "pack_dtype": "bf16", "plane_stride": 1, "K": None,
        "pack_dither": None,
        "mesh": None, "grid_axis": None, "pp_axis": None,
    },
    "diagnostics": ["shadowgraphy"],
    "detector": {"bin_scale": 8},
    "output": {"dir": "campaign_out", "checkpoint": "checkpoint.npz",
               "checkpoint_every": 1},
}


def merge_config(user: dict) -> dict:
    """DEFAULTS overlaid with ``user``; unknown keys raise."""
    cfg = copy.deepcopy(DEFAULTS)
    for section, val in user.items():
        if section.startswith("_"):
            continue                      # JSON comment idiom
        if section not in cfg:
            raise SystemExit(f"unknown config section {section!r} "
                             f"(known: {sorted(cfg)})")
        if isinstance(cfg[section], dict):
            if not isinstance(val, dict):
                raise SystemExit(f"config section {section!r} must be an "
                                 f"object")
            for k, v in val.items():
                if k not in cfg[section]:
                    raise SystemExit(
                        f"unknown key {section}.{k!r} "
                        f"(known: {sorted(cfg[section])})")
                cfg[section][k] = v
        else:
            cfg[section] = val
    return cfg


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Config-driven ray-trace campaign "
                    "(chunked, checkpointed, exact coherent reduction)")
    p.add_argument("config", help="JSON config path (schema: module "
                                  "docstring)")
    p.add_argument("-o", "--outdir", default=None,
                   help="override output.dir")
    p.add_argument("--total-rays", type=float, default=None,
                   help="override trace.total_rays")
    p.add_argument("--chunk-rays", type=float, default=None,
                   help="override trace.chunk_rays")
    p.add_argument("--fresh", action="store_true",
                   help="ignore/remove an existing checkpoint")
    p.add_argument("--quiet", action="store_true")
    return p


def _build_domain(dcfg: dict, coherent: bool):
    import numpy as np

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.io import read_pvti

    if dcfg["pvti"]:
        ne, shape, spacing = read_pvti(dcfg["pvti"])
        lengths = tuple(shape[i] * spacing[i] for i in range(3))
        domain = ScalarDomain(lengths, shape,
                              probing_direction=dcfg["probing"])
        domain.external_ne(ne)
    else:
        domain = ScalarDomain(dcfg["length"], dcfg["dim"],
                              probing_direction=dcfg["probing"])
        getattr(domain, dcfg["ne_type"])(**dcfg["ne_kwargs"])
    dims = tuple(domain.dims)
    if dcfg["Te"] is not None or dcfg["Z"] is not None:
        if dcfg["Te"] is None or dcfg["Z"] is None:
            raise SystemExit("inv_brems needs BOTH domain.Te and domain.Z")
        domain.external_Te(np.full(dims, float(dcfg["Te"]), np.float32))
        domain.external_Z(np.full(dims, float(dcfg["Z"]), np.float32))
        domain.inv_brems = True
    elif dcfg["inv_brems"]:
        raise SystemExit("inv_brems=true needs uniform domain.Te and "
                         "domain.Z values (or use the Python API for "
                         "gridded ones)")
    if dcfg["B"] is not None:
        B = np.zeros(dims + (3,), np.float32)
        B[:] = np.asarray(dcfg["B"], np.float32)
        domain.external_B(B)
    domain.phaseshift = bool(dcfg["phaseshift"]) or coherent
    return domain


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    with open(args.config) as f:
        cfg = merge_config(json.load(f))
    if args.outdir:
        cfg["output"]["dir"] = args.outdir
    if args.total_rays:
        cfg["trace"]["total_rays"] = args.total_rays
    if args.chunk_rays:
        cfg["trace"]["chunk_rays"] = args.chunk_rays
    tr = cfg["trace"]
    if not tr["total_rays"]:
        raise SystemExit("trace.total_rays is required")
    total = int(float(tr["total_rays"]))
    chunk = min(int(float(tr["chunk_rays"])), total)

    import jax
    import numpy as np

    from synthpy_tpu import pipeline
    from synthpy_tpu.campaign import run_campaign
    from synthpy_tpu.io import save_histograms
    from synthpy_tpu.tracer import init_beam

    diags = tuple(cfg["diagnostics"])
    unknown = [d for d in diags if d not in pipeline.BENCHES]
    if unknown:
        raise SystemExit(f"unknown diagnostics {unknown} "
                         f"(known: {sorted(pipeline.BENCHES)})")
    coherent = {d for d in diags if pipeline.BENCHES[d][1]}

    mesh = grid_axis = None
    if tr["mesh"]:
        from synthpy_tpu.parallel.mesh import mesh_from_spec
        from synthpy_tpu.parallel.multihost import initialize

        # no-op on a single host; on multi-process jobs connects the hosts
        # so the mesh spec addresses the GLOBAL device set
        initialize()
        try:
            mesh, grid_axis = mesh_from_spec(tr["mesh"], tr["grid_axis"],
                                             tr["pp_axis"])
        except ValueError as e:
            raise SystemExit(str(e))
        if tr["pp_axis"] and grid_axis:
            raise SystemExit("trace.pp_axis and trace.grid_axis are "
                             "mutually exclusive")
        if ((grid_axis is not None or tr["pp_axis"])
                and tr["solver"] != "zscan_seg"):
            raise SystemExit("a grid/pp axis in trace.mesh requires "
                             "trace.solver zscan_seg (both shard the "
                             "segmented fast path)")

    t0 = time.perf_counter()
    domain = _build_domain(cfg["domain"], bool(coherent))

    # one pack for the WHOLE campaign (stride/quantised tiers amortise
    # their build across every chunk; ROADMAP "Performance" regime split)
    spack = None
    if tr["solver"] == "zscan_seg":
        from synthpy_tpu.tracer.zscan import build_segment_pack_device

        ps = int(tr["plane_stride"])
        from synthpy_tpu.tracer.zscan import PACK_DTYPES
        dt = PACK_DTYPES[tr["pack_dtype"]]
        if tr["pack_dtype"] == "int4" and tr["integrator"] not in (
                "rk2s2", "rk2s4"):
            raise SystemExit("pack_dtype int4 requires integrator rk2s2 "
                             "or rk2s4 (nibble pairs read byte-aligned "
                             "plane pairs)")
        if ps != 1 and tr["integrator"] == "rk4":
            raise SystemExit("plane_stride needs an even-stride integrator "
                             "(rk2/rk2s2/rk2s4): rk4 blends mid-slab "
                             "planes the decimated pack no longer holds "
                             "exactly")
        if (tr["pack_dither"] is not None
                and tr["pack_dtype"] not in ("int8", "int4")):
            raise SystemExit("pack_dither applies to pack_dtype int8 or "
                             "int4")
        if tr["K"] is not None:
            K = int(tr["K"])
        else:
            n_p = domain.dims[
                {"x": 0, "y": 1, "z": 2}[cfg["domain"]["probing"]]]
            # whole-trace segments (fast profile) rounded to the
            # stride/nibble alignment the tier needs
            align = max(2 * ps if tr["pack_dtype"] == "int4" else ps, 1)
            K = max(n_p // align * align, align)
        build_mesh = None
        if grid_axis is not None:
            # sharded build needs the transverse a-dim to divide over the
            # grid axis; otherwise build on one device — pipeline.run pads
            # the tables with zero a-rows (exact) before the sharded march
            p_ax = {"x": 0, "y": 1, "z": 2}[cfg["domain"]["probing"]]
            a_dim = [domain.dims[i] for i in range(3) if i != p_ax][0]
            if a_dim % mesh.shape[grid_axis] == 0:
                build_mesh = mesh
        spack = build_segment_pack_device(
            domain, lwl=tr["lwl"], K=K, dtype=dt, plane_stride=ps,
            dither=tr["pack_dither"],
            mesh=build_mesh, mesh_axis=grid_axis or "grid")
    t_setup = time.perf_counter() - t0

    bins = (3448 // cfg["detector"]["bin_scale"],
            2574 // cfg["detector"]["bin_scale"])
    beam = cfg["beam"]
    beam_size = beam["size"] or 0.4 * domain.extent
    extra = {}
    if tr["solver"] in ("zscan_seg", "analytic"):
        extra["integrator"] = tr["integrator"]
    if tr["solver"] == "zscan_seg":
        extra["seg_weights"] = tr["seg_weights"]
    if spack is not None:
        extra["spack"] = spack
    if mesh is not None:
        extra["mesh"] = mesh
        if grid_axis is not None:
            extra["grid_axis"] = grid_axis
        if tr["pp_axis"] is not None:
            extra["pp_axis"] = tr["pp_axis"]

    n_chunks = -(-total // chunk)

    def chunk_fn(chunk_key, k):
        # exact total: the final chunk carries the remainder (one extra
        # compile at most; counts then sum to total_rays exactly)
        rays_k = chunk if k < n_chunks - 1 else total - chunk * (
            n_chunks - 1)
        s0 = init_beam(chunk_key, rays_k, beam_size, beam["divergence"],
                       domain.extent, beam["type"],
                       cfg["domain"]["probing"])
        out = pipeline.run(domain, s0, diagnostic=diags, lwl=tr["lwl"],
                           solver=tr["solver"], bins=bins,
                           coherent_raw=True, **extra)
        # multi-diagnostic runs return a name->image dict; single, the
        # bare image
        return out if isinstance(out, dict) else {diags[0]: out}

    def finalize(acc):
        return {n: np.asarray(pipeline.finalize_coherent(img, n))
                for n, img in acc.items()}

    outdir = cfg["output"]["dir"]
    os.makedirs(outdir, exist_ok=True)
    ckpt = (os.path.join(outdir, cfg["output"]["checkpoint"])
            if cfg["output"]["checkpoint"] else None)
    if args.fresh and ckpt and os.path.exists(ckpt):
        os.remove(ckpt)

    t1 = time.perf_counter()
    images = run_campaign(chunk_fn, total, chunk,
                          jax.random.PRNGKey(int(cfg["seed"])),
                          checkpoint_path=ckpt,
                          checkpoint_every=int(
                              cfg["output"]["checkpoint_every"]),
                          verbose=not args.quiet, finalize=finalize)
    t_run = time.perf_counter() - t1

    img_path = save_histograms(os.path.join(outdir, "images.npz"),
                               **images)
    summary = {
        "config": args.config,
        "domain": list(domain.dims),
        "total_rays": total,
        "chunk_rays": chunk,
        "diagnostics": list(diags),
        "solver": tr["solver"],
        "integrator": tr["integrator"],
        "pack_dtype": tr["pack_dtype"],
        "plane_stride": tr["plane_stride"],
        "setup_seconds": round(t_setup, 4),
        "run_seconds": round(t_run, 4),
        "images": img_path,
        "image_sums": {n: float(v.sum()) for n, v in images.items()},
    }
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
