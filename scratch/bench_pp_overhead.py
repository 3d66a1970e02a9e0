"""Measured single-device-mesh overhead of the multi-chip tracers.

No multi-chip ICI exists on this host, but the WRAPPER cost of the two
multi-chip paths is measurable on a 1-device mesh on the real TPU: the
PP schedule (macro-step scan, psum chunk moves that degenerate to
copies) and the grid-sharded march (halo ppermute, ownership psum) each
run their full collective program with trivial communication, so
(wrapped rate) / (plain rate) bounds the orchestration overhead a real
mesh would add on top of actual transfer time.

512^3, rk2s2/slab equivalents (PP runs weights='stage' internally via
march_segment defaults — both arms use the same settings so the ratio
isolates the wrapper).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import NamedSharding, PartitionSpec as P

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.parallel import (make_gridsharded_segment_tracer,
                                  make_pipelined_segment_tracer)
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      trace_zscan_segments)


def timed(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    integ = sys.argv[3] if len(sys.argv) > 3 else "rk2s2"
    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    K = 64
    sp = build_segment_pack_device(d, K=K, dtype=jnp.bfloat16)
    n_seg = sp.seg_planes.shape[0]
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]],
                  axis=1)
    dp = jnp.float32(sp.dp)

    base_fn = lambda: trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K, n_seg=n_seg,
        integrator=integ, ray_chunk=None)
    ref, t_b = timed(base_fn)
    print(f"plain march (K={K}, n_seg={n_seg}): {t_b*1e3:.1f} ms  "
          f"{rays/t_b/1e6:.2f} M rays/s", flush=True)
    ref = np.asarray(ref)

    # --- PP tracer on a 1-device mesh -------------------------------
    mesh = jax.make_mesh((1,), ("seg",))
    M = 8
    chunks = u.reshape(M, rays // M, 8)
    pp = make_pipelined_segment_tracer(mesh, lay, sp, n_chunks=M,
                                       integrator=integ)
    pp_fn = lambda: pp(chunks, sp.seg_planes, sp.origin_ab,
                       sp.inv_spacing_ab, dp)
    out, t_pp = timed(pp_fn)
    out = np.asarray(out).reshape(rays, 8)
    print(f"PP 1-device mesh (M={M} chunks): {t_pp*1e3:.1f} ms  "
          f"{rays/t_pp/1e6:.2f} M rays/s  overhead "
          f"{100*(t_pp/t_b-1):.1f}%  bitident={np.array_equal(out, ref)}",
          flush=True)

    # --- grid-sharded segmented march on a 1-device mesh ------------
    gmesh = jax.make_mesh((1, 1), ("grid", "rays"))
    na, nb = sp.shape_ab
    C = sp.seg_planes.shape[-1] // (K + 1)
    seg_tables = sp.seg_planes.reshape(n_seg, na, nb, (K + 1) * C)
    gt = make_gridsharded_segment_tracer(gmesh, lay, sp,
                                         ray_axis="rays",
                                         integrator=integ)
    u_sh = jax.device_put(u, NamedSharding(gmesh, P("rays", None)))
    g_fn = lambda: gt(u_sh, seg_tables, sp.origin_ab,
                      sp.inv_spacing_ab, dp)
    outg, t_g = timed(g_fn)
    outg = np.asarray(outg)
    print(f"grid-sharded 1-device mesh: {t_g*1e3:.1f} ms  "
          f"{rays/t_g/1e6:.2f} M rays/s  overhead "
          f"{100*(t_g/t_b-1):.1f}%  bitident={np.array_equal(outg, ref)}",
          flush=True)


if __name__ == "__main__":
    main()
