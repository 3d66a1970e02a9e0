"""Headline benchmark: rays/sec/chip through a 512^3 field, shadowgram.

Mirrors BASELINE.json: the metric is ray-trace throughput on one chip for
the flagship configuration (512^3 n_e grid, 9-component ray push, full
shadowgraphy detector synthesis). The headline runs the PRODUCTION
integrator (midpoint rk2, oracle-validated to the rk4 tolerance class);
the RK4 reference-parity rate is in detail.rk4_rays_s, and
BENCH_INTEGRATOR=rk4 swaps the headline back. The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` is reported against the driver's
north-star target of 1e8 rays -> finished shadowgram in 60 s on a v5e-8
(8 chips), i.e. 1e8/60/8 ~= 2.08e5 rays/s/chip == 1.0.

Prints exactly one JSON line. Environment overrides:
    BENCH_DIM (default 512), BENCH_RAYS (default 4_000_000),
    BENCH_SOLVER (zscan_seg | zscan | time), BENCH_K (segment length,
    default dim-1 = fast profile), BENCH_PACK_DTYPE (bf16 | f32 | int8 |
    int4),
    BENCH_STEPS_PER_CELL, BENCH_INTEGRATOR (rk2 | rk4),
    BENCH_WEIGHTS (slab | stage; default slab for zscan_seg: the
    per-slab transverse-weight hoist is the production fast mode,
    image-equivalent and test-gated; stage = strict per-stage parity),
    BENCH_E2E_RAYS (default 2e7 on TPU) scales the ALWAYS-ON cold-start
    end-to-end measurement (field + pack + trace + detector) reported as
    detail.end_to_end with its full tier config inline;
    BENCH_FULL=1 additionally runs the REAL 1e8-ray north star, reported
    as detail.measured_1e8_end_to_end in the same self-describing shape.
    Both honour BENCH_FULL_INTEGRATOR / BENCH_FULL_CHUNK /
    BENCH_FULL_PACK_DTYPE / BENCH_FULL_PLANE_STRIDE.

The default fast profile (bf16 field channels, whole-trace corner
segments) is image-equivalent to the exact f32 tracer at sub-pixel level
(tests/test_zscan.py::test_zscan_segments_full_K_image_equivalence).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
    from synthpy_tpu import pipeline
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.propagator import default_n_steps

    backend = jax.default_backend()
    dim = int(os.environ.get("BENCH_DIM", 512 if backend == "tpu" else 64))
    rays = int(os.environ.get(
        "BENCH_RAYS", 4_000_000 if backend == "tpu" else 20_000))
    spc = float(os.environ.get("BENCH_STEPS_PER_CELL", 1.0))
    solver = os.environ.get("BENCH_SOLVER", "zscan_seg")

    ext = 5e-3
    domain = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(domain)
    n_steps = (dim - 1 if solver.startswith("zscan")
               else default_n_steps(domain, ext, spc))

    pack_kwargs = {"pack": pack}
    pdt = K = None
    if solver == "zscan_seg":
        from synthpy_tpu.tracer.zscan import (PACK_DTYPES,
                                              build_segment_pack_device)

        # default K = dim (EVEN): one zero-field pad slab, image-exact,
        # and the stride-2 march runs pure slab pairs (an odd K's
        # trailing single step costs ~20% on rk2s2)
        K = int(os.environ.get("BENCH_K", dim))
        pdt = PACK_DTYPES[os.environ.get("BENCH_PACK_DTYPE", "bf16")]
        pack_kwargs = {"spack": build_segment_pack_device(
            domain, K=min(K, dim), dtype=pdt)}

    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    # headline = the production configuration: midpoint (rk2) integrator,
    # oracle-validated to the rk4 tolerance class
    # (tests/test_zscan.py::test_zscan_segments_rk2_matches_rk4_and_oracle);
    # the RK4 reference-parity rate is reported in detail.rk4_rays_s.
    integrator = os.environ.get(
        "BENCH_INTEGRATOR", "rk2" if solver == "zscan_seg" else "rk4")

    # production fast mode: transverse weights + inside-mask hoisted to
    # once per slab (image-equivalent, gated by
    # tests/test_zscan.py::test_weights_slab_mode_image_equivalent);
    # BENCH_WEIGHTS=stage swaps back to strict per-stage parity mode
    weights = os.environ.get("BENCH_WEIGHTS",
                             "slab" if solver == "zscan_seg" else "stage")

    def run(integ, pk=None):
        kw = ({"integrator": integ, "seg_weights": weights}
              if solver == "zscan_seg" else {})
        return pipeline.run(domain, s0, solver=solver,
                            steps_per_cell=spc, bins=(431, 321),
                            **(pk or pack_kwargs), **kw)

    def timed(integ, pk=None):
        H = run(integ, pk)      # compile
        H.block_until_ready()
        # best of 3: early timed runs can still hit caches cold
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            H = run(integ, pk)
            H.block_until_ready()
            times.append(time.perf_counter() - t0)
        return H, min(times)

    H, elapsed = timed(integrator)
    rk4_rays_s = rk2s2_rays_s = rk2s4_rays_s = int8_rk2s2_rays_s = None
    int4_rk2s4_rays_s = int4s2_rk2s2_rays_s = int4s4_rk2s2_rays_s = None
    if solver == "zscan_seg" and integrator == "rk2":
        _, el4 = timed("rk4")
        rk4_rays_s = round(rays / el4, 1)
        # stride-2 midpoint (validated to the same tolerance class;
        # tests/test_zscan.py::test_rk2s2_matches_rk4_and_images)
        _, els2 = timed("rk2s2")
        rk2s2_rays_s = round(rays / els2, 1)
        # stride-4 midpoint (image-equivalence tier;
        # tests/test_zscan.py::test_rk2s4_images_close)
        _, els4 = timed("rk2s4")
        rk2s4_rays_s = round(rays / els4, 1)
        if pdt not in (jnp.int8, "int4"):
            from synthpy_tpu.tracer.zscan import build_segment_pack_device

            # int8 tier (per-(plane, channel)-scaled quantised pack):
            # halves the gather-bound march's bytes/ray; image-equivalence
            # gated by tests/test_zscan.py::test_int8_pack_matches_float_pack.
            # Built lazily HERE so non-rk2 headline runs never hold a dead
            # quantised pack in HBM during the timed measurement.
            spack_int8 = build_segment_pack_device(
                domain, K=min(K, dim), dtype=jnp.int8)
            # stride-2 midpoint on the int8 quantised pack (gather
            # bytes/ray halved)
            _, elq = timed("rk2s2", {"spack": spack_int8})
            int8_rk2s2_rays_s = round(rays / elq, 1)
            del spack_int8
            # fastest single-chip tier: stride-4 midpoint on the int4
            # nibble pack (gather bytes/ray quartered vs bf16;
            # turbulent-field error int8-class, lens caustics are the
            # documented worst case — scratch/int4_error_512.py)
            from synthpy_tpu.tracer.zscan import (
                build_segment_pack_device as _bspd)
            spack_int4 = _bspd(domain, K=min(K, dim) // 4 * 4,
                               dtype="int4")
            _, elq4 = timed("rk2s4", {"spack": spack_int4})
            int4_rk2s4_rays_s = round(rays / elq4, 1)
            del spack_int4
            # plane-decimated tiers: rk2s2 on a stride-2 pack is
            # BIT-identical to rk2s4 on the full pack at half the
            # gather bytes (tests/test_zscan.py::
            # test_decimated_pack_rk2s2_equals_rk2s4); stride-4 +
            # rk2s2 is the effective-stride-8 tier (own accuracy
            # envelope: scratch/results_stride_error_512.jsonl)
            sp_s2 = _bspd(domain, K=min(K, dim) // 4 * 4, dtype="int4",
                          plane_stride=2)
            _, els2q = timed("rk2s2", {"spack": sp_s2})
            int4s2_rk2s2_rays_s = round(rays / els2q, 1)
            del sp_s2
            sp_s4 = _bspd(domain, K=min(K, dim) // 8 * 8, dtype="int4",
                          plane_stride=4)
            _, els4q = timed("rk2s2", {"spack": sp_s4})
            int4s4_rk2s2_rays_s = round(rays / els4q, 1)
            del sp_s4

    # analytic pack-free tier (the bench lens has a closed form): zero
    # pack build, zero gathers; 64 steps is the CONVERGED point for this
    # field (rel_v_err 5.8e-5 = f32 floor, flat 32..512 steps —
    # scratch/results_analytic_r3.jsonl), so this tier is EXACT where
    # the gridded tiers carry interpolation error.
    analytic_rk2_rays_s = None
    if (solver == "zscan_seg" and integrator == "rk2"
            and getattr(domain, "analytic", None) is not None):
        def run_analytic():
            return pipeline.run(domain, s0, solver="analytic",
                                bins=(431, 321), integrator="rk2",
                                n_steps=64, critical_guard=None)

        Ha = run_analytic()
        Ha.block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            Ha = run_analytic()
            Ha.block_until_ready()
            times.append(time.perf_counter() - t0)
        analytic_rk2_rays_s = round(rays / min(times), 1)

    # End-to-end measurement (field + pack + trace + detector from a cold
    # start), self-describing: the exact tier configuration rides in the
    # artifact so the number is auditable without the surrounding env.
    # Always runs at a scaled ray count (BENCH_E2E_RAYS, default 2e7 on
    # TPU) so driver artifacts never carry a null end-to-end field;
    # BENCH_FULL=1 additionally runs the REAL 1e8-ray north star.
    def end_to_end(total: int, ns_integ: str, chunk: int, fdt_name: str,
                   fps: int) -> dict:
        from synthpy_tpu.fields import ScalarDomain as _SD
        from synthpy_tpu.tracer import init_beam as _ib
        from synthpy_tpu.tracer.zscan import (PACK_DTYPES,
                                              build_segment_pack_device)

        fdt = PACK_DTYPES[fdt_name]
        t0 = time.perf_counter()
        d2 = _SD(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
        sp2 = build_segment_pack_device(d2, K=dim, dtype=fdt,
                                        free_ne=True, plane_stride=fps)
        jax.block_until_ready(sp2.seg_planes)
        pack_s = time.perf_counter() - t0
        key = jax.random.PRNGKey(0)
        acc = None
        for k in range(max(total // chunk, 1)):
            s_k = _ib(jax.random.fold_in(key, k), chunk, 2e-3, 0.0, ext,
                      "circular")
            Hk = pipeline.run(d2, s_k, spack=sp2, solver="zscan_seg",
                              bins=(431, 321), critical_guard=None,
                              integrator=ns_integ, seg_weights=weights)
            acc = Hk if acc is None else acc + Hk
        acc.block_until_ready()
        wall = time.perf_counter() - t0
        # cold-start 1e8 projection: pack build once + trace scaled
        proj_1e8 = pack_s + (wall - pack_s) * (1e8 / total)
        return {
            "rays": total, "dim": dim, "integrator": ns_integ,
            "pack_dtype": fdt_name, "plane_stride": fps, "chunk": chunk,
            "weights": weights, "pack_s": round(pack_s, 2),
            "wall_s": round(wall, 2), "rays_per_s": round(total / wall, 1),
            "extrapolated_1e8_s": round(proj_1e8, 1),
        }

    ns_integ = os.environ.get("BENCH_FULL_INTEGRATOR", "rk2s2")
    chunk = int(float(os.environ.get("BENCH_FULL_CHUNK", 4_000_000)))
    # fastest validated tier by default: int8 quantised pack
    # (image-equivalence gated; BENCH_FULL_PACK_DTYPE=bf16 reverts);
    # BENCH_FULL_PLANE_STRIDE=2 + rk2s2 = the rk2s4-class tier at
    # half the gather bytes (bit-identical, test-gated)
    fdt_name = os.environ.get("BENCH_FULL_PACK_DTYPE", "int8")
    fps = int(os.environ.get("BENCH_FULL_PLANE_STRIDE", 1))

    e2e = e2e_best = measured_1e8 = None
    if solver == "zscan_seg" and integrator.startswith("rk2"):
        e2e_rays = int(float(os.environ.get(
            "BENCH_E2E_RAYS", 2e7 if backend == "tpu" else 4e4)))
        e2e = end_to_end(e2e_rays, ns_integ, min(chunk, e2e_rays),
                         fdt_name, fps)
        # the repo's fastest validated single-chip tier (rk2s4 + int4
        # nibble pack; accuracy envelope: scratch/int4_error_512.py and
        # tests/test_zscan.py int4 gates) measured in the SAME
        # self-describing shape so the headline end-to-end story rides in
        # the driver artifact, not in scratch archaeology (VERDICT r4 #5)
        e2e_best = end_to_end(e2e_rays, "rk2s4", min(chunk, e2e_rays),
                              "int4", 1)
        if os.environ.get("BENCH_FULL") == "1":
            total = int(float(os.environ.get("BENCH_FULL_RAYS", 1e8)))
            measured_1e8 = end_to_end(total, ns_integ, chunk, fdt_name, fps)

    rays_per_sec = rays / elapsed

    # Roofline accounting (VERDICT r4 #8): the segment march's HBM-side
    # work is the 4-corner column gather — 4 contiguous rows of
    # (planes/stride)*C channel values per ray per trace (zscan.py
    # "Segmented column-gather tracer"). Achieved gather bytes/s at the
    # measured rays/s, against (a) the chip's streaming HBM peak and
    # (b) the measured random-row gather-engine rate (~44 GB/s on v5e,
    # ROADMAP "Performance" / DESIGN.md step 6) — the latter is the real
    # ceiling for descriptor-rate-bound random gathers, which is why the
    # int4 tiers go compute-bound (~85%) rather than pinning HBM peak.
    HBM_PEAK_GBPS = 819.0   # v5e datasheet stream peak
    GATHER_ENGINE_GBPS = 44.0

    def roofline(rate, bpc, stride=1):
        if rate is None:
            return None
        n_ch = int(pack.channels.shape[-1])
        planes = (dim // stride) + 1
        bytes_ray = 4 * planes * n_ch * bpc
        gbps = rate * bytes_ray / 1e9
        return {"bytes_per_ray": round(bytes_ray, 1),
                "achieved_gather_GBps": round(gbps, 2),
                "pct_hbm_stream_peak": round(100 * gbps / HBM_PEAK_GBPS, 1),
                "pct_gather_engine": round(
                    100 * gbps / GATHER_ENGINE_GBPS, 1)}

    roof = None
    if solver == "zscan_seg":
        bpc_head = {jnp.bfloat16: 2.0, jnp.float32: 4.0, jnp.int8: 1.0,
                    "int4": 0.5}.get(pdt, 2.0)
        roof = {
            "channels": int(pack.channels.shape[-1]),
            "assumed_hbm_stream_peak_GBps": HBM_PEAK_GBPS,
            "assumed_gather_engine_GBps": GATHER_ENGINE_GBPS,
            "headline": roofline(rays_per_sec, bpc_head),
            "int8_rk2s2": roofline(int8_rk2s2_rays_s, 1.0),
            "int4_rk2s4": roofline(int4_rk2s4_rays_s, 0.5),
            "int4s4_rk2s2": roofline(int4s4_rk2s2_rays_s, 0.5, stride=4),
        }

    # north-star: 1e8 rays end-to-end in 60 s on a v5e-8 -> per chip:
    target = 1e8 / 60.0 / 8.0
    result = {
        "metric": f"rays/sec/chip ({dim}^3 n_e grid, "
                  f"{integrator.upper()} {solver} "
                  f"{n_steps} steps, shadowgram synthesis)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / target, 4),
        "detail": {
            "backend": backend,
            "solver": solver,
            "integrator": integrator,
            "weights": weights if solver == "zscan_seg" else None,
            "dim": dim,
            "rays": rays,
            "n_steps": n_steps,
            "elapsed_s": round(elapsed, 4),
            "extrapolated_1e8_rays_s": round(1e8 / rays_per_sec, 2),
            "rk4_rays_s": rk4_rays_s,
            "rk2s2_rays_s": rk2s2_rays_s,
            "rk2s4_rays_s": rk2s4_rays_s,
            "int8_rk2s2_rays_s": int8_rk2s2_rays_s,
            "int4_rk2s4_rays_s": int4_rk2s4_rays_s,
            # bit-identical to int4_rk2s4 at half the gather bytes
            "int4s2_rk2s2_rays_s": int4s2_rk2s2_rays_s,
            # effective-stride-8 tier (accuracy envelope in
            # scratch/results_stride_error_512.jsonl)
            "int4s4_rk2s2_rays_s": int4s4_rk2s2_rays_s,
            # pack-free closed-form march at its converged 64-step point
            # (exact field, no gathers; scratch/results_analytic_r3.jsonl)
            "analytic_rk2_rays_s": analytic_rk2_rays_s,
            # always-on scaled end-to-end (cold field+pack+trace+detector)
            # with its full tier config inline — auditable from the
            # artifact alone
            "end_to_end": e2e,
            # same cold-start measurement on the fastest validated tier
            # (rk2s4 + int4): the headline end-to-end story, in-artifact
            "end_to_end_best": e2e_best,
            # achieved gather bytes/s vs stream peak and vs the measured
            # random-row gather-engine rate (the binding ceiling)
            "roofline": roof,
            # the REAL 1e8-ray north star, freshly measured under
            # BENCH_FULL=1 (same self-describing shape), else absent
            "measured_1e8_end_to_end": measured_1e8,
            "checksum": float(jnp.asarray(H).sum()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
