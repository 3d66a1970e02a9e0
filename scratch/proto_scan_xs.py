"""Prototype: rk2s2 march with corners restructured so the slab scan
consumes stage planes as native scan xs (leading-axis slices) instead of
per-iteration dynamic_slice on a flat (N,(K+1)C) buffer.

Hypothesis: kills the dynamic-slice_convert_fusion (~19% of the march in
scratch/profile_r3 round-3 profile) at the cost of one extra
restructure copy per segment.
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (_cols_rhs, _cols_weights,
                                      build_segment_pack_device,
                                      trace_zscan_segments)


@partial(jax.jit, static_argnames=("shape_ab", "layout", "K", "C",
                                   "unroll"))
def march_xs(u, seg_planes, origin_ab, inv_ab, dp, *, shape_ab, layout,
             K, C, unroll=2):
    """rk2s2, weights='slab', corners as scan xs (single segment)."""
    na, nb = shape_ab
    h = dp

    def seg_march(uc, seg):
        ta = (uc[:, 0] - origin_ab[0]) * inv_ab[0]
        tb = (uc[:, 1] - origin_ab[1]) * inv_ab[1]
        ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
        ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
        base = ia0 * nb + ib0
        corners = tuple(
            jnp.take(seg, base + off, axis=0, mode="clip")
            for off in (0, 1, nb, nb + 1))
        ia0f = ia0.astype(uc.dtype)
        ib0f = ib0.astype(uc.dtype)

        # restructure: (N, (K+1)C) -> even/odd plane stacks (K//2, N, C)
        def planes_of(c):
            ct = c.reshape(-1, K + 1, C)
            return (jnp.swapaxes(ct[:, 0:K:2, :], 0, 1),
                    jnp.swapaxes(ct[:, 1:K:2, :], 0, 1))

        stacks = tuple(planes_of(c) for c in corners)
        xs = (tuple(s[0] for s in stacks), tuple(s[1] for s in stacks))

        cols = tuple(uc[:, i] for i in range(8))
        w4 = _cols_weights(cols, ia0f, ib0f, origin_ab, inv_ab, shape_ab)
        w00, w01, w10, w11 = w4

        def blend(wv):
            v00, v01, v10, v11 = (w.astype(cols[0].dtype) for w in wv)
            return (w00[:, None] * v00 + w01[:, None] * v01
                    + w10[:, None] * v10 + w11[:, None] * v11)

        def pair(cc, x):
            wv0, wvm = x
            k1 = _cols_rhs(cc, blend(wv0), layout, -1.0)
            mid = tuple(a + h * kv for a, kv in zip(cc, k1))
            k2 = _cols_rhs(mid, blend(wvm), layout, -1.0)
            return tuple(a + 2.0 * h * kv for a, kv in zip(cc, k2)), None

        cols, _ = jax.lax.scan(pair, cols, xs, unroll=unroll)
        return jnp.stack(cols, axis=1)

    def segment(uc, s):
        seg = jax.lax.dynamic_slice_in_dim(seg_planes, s, 1, axis=0)[0]
        return seg_march(uc, seg), None

    out, _ = jax.lax.scan(segment, u, jnp.arange(seg_planes.shape[0]))
    return out


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    sp = build_segment_pack_device(d, K=dim, dtype=jnp.bfloat16)
    C = sp.seg_planes.shape[-1] // (sp.K + 1)
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext, "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]], axis=1)
    dp = jnp.float32(sp.dp)

    def timed(f):
        out = f()
        out.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return out, min(ts)

    ref, t_ref = timed(lambda: trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0], integrator="rk2s2",
        weights="slab", ray_chunk=None))
    out, t_xs = timed(lambda: march_xs(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K, C=C))
    import numpy as np

    err = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
    rec = {"dim": dim, "rays": rays,
           "t_slab_dynslice": round(t_ref, 4),
           "t_scan_xs": round(t_xs, 4),
           "rays_s_ref": round(rays / t_ref, 1),
           "rays_s_xs": round(rays / t_xs, 1),
           "max_abs_diff": err}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
