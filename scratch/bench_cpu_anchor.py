"""Measured CPU anchor for the ">=100x CPU reference" target.

Denominator: the reference's own legacy full_solver (NumPy/SciPy, its
physics ground truth — the modern diffrax path cannot run here, diffrax
is not installed), driven exactly as its MPI production scripts drive it
(calc_dndr once, solve_ivp over the bundle; pvti_trace_mpi.py:71-163).
Also measures THIS repo's pipeline on the CPU backend for a same-backend
comparison. Grids per the reference's solver-comparison harness
(solver_comparisons.py:35-38), ray counts small because the reference is
interpreter-bound (rays/s is measured to be ray-count-insensitive here).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/src/solvers-legacy")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

LOG = "/root/repo/scratch/results_cpu_anchor.jsonl"


def log(**kw):
    kw["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def bench_reference(dim, rays):
    import full_solver as fs

    ext = 5e-3
    x = np.linspace(-ext, ext, dim)
    d = fs.ScalarDomain(x, x, x, ext)
    d.test_exponential_cos()
    t0 = time.perf_counter()
    d.calc_dndr(lwl=1064e-9)
    t_pack = time.perf_counter() - t0
    s0 = fs.init_beam(rays, 2e-3, 0.0, ext, "circular")
    t0 = time.perf_counter()
    d.solve(s0)
    el = time.perf_counter() - t0
    log(tag="cpu_reference_full_solver", dim=dim, rays=rays,
        pack_s=round(t_pack, 2), solve_s=round(el, 2),
        rays_per_s=round(rays / el, 1))
    return rays / el


def bench_ours_cpu(dim, rays):
    import jax.numpy as jnp

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_exponential_cos()
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")

    def run():
        return pipeline.run(d, s0, solver="zscan_seg", bins=(431, 321),
                            seg_K=dim - 1)

    H = run().block_until_ready()  # compile
    t0 = time.perf_counter()
    H = run().block_until_ready()
    el = time.perf_counter() - t0
    log(tag="ours_cpu_zscan_seg", dim=dim, rays=rays,
        solve_s=round(el, 3), rays_per_s=round(rays / el, 1),
        image_sum=float(jnp.asarray(H).sum()))
    return rays / el


if __name__ == "__main__":
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ref_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    our_rays = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    r_ref = bench_reference(dim, ref_rays)
    r_ours = bench_ours_cpu(dim, our_rays)
    log(tag="cpu_anchor_summary", dim=dim,
        ref_rays_per_s=round(r_ref, 1), ours_cpu_rays_per_s=round(r_ours, 1),
        ours_cpu_vs_ref=round(r_ours / r_ref, 1))
