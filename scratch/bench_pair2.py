"""Round-3 lever probe: FUSED two-pair rk2s2 slab body (4 slabs/iter).

Hypothesis: the rk2s2 march's remaining overhead is loop structure —
the profile (scratch/profile_r3.py) shows `while` 19ms + dynamic-slice
12ms against 37ms stage math for a 63ms 262k-ray chunk. A body that
advances FOUR slabs per scan iteration with ONE 4C-column window slice
per corner (vs two iterations x one 2C slice each) halves both the
iteration count and the dynamic-slice op count at identical arithmetic.

Measures single-chip rk2s2 (weights=slab) baseline vs the fused variant
at 512^3 / 262k rays on the real TPU.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

from synthpy_tpu.fields import ScalarDomain, layout_of
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (_cols_weights, _seg_deriv_w,
                                      build_segment_pack_device,
                                      trace_zscan_segments)


@partial(jax.jit, static_argnames=("shape_ab", "layout", "K", "C",
                                   "unroll", "body"))
def march_pair2(uc, seg, origin_ab, inv_ab, dp, *, shape_ab, layout,
                K, C, unroll=2, body=2):
    """rk2s2 march with `body` PAIRS fused per scan iteration."""
    na, nb = shape_ab
    h = dp
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

    span = 2 * body  # slabs per iteration

    def fused(cols, j):
        k = span * j
        dtype = cols[0].dtype
        wins = tuple(
            jax.lax.dynamic_slice_in_dim(c, k * C, span * C,
                                         axis=1).astype(dtype)
            for c in corners)
        h2 = 2.0 * h
        for p in range(body):
            w0 = tuple(w[:, 2 * p * C:(2 * p + 1) * C] for w in wins)
            wm = tuple(w[:, (2 * p + 1) * C:(2 * p + 2) * C]
                       for w in wins)
            w4 = _cols_weights(cols, ia0f, ib0f, origin_ab, inv_ab,
                               shape_ab)
            k1 = _seg_deriv_w(cols, w0, w4, layout, -1.0)
            k2 = _seg_deriv_w(tuple(x + h * kv
                                    for x, kv in zip(cols, k1)),
                              wm, w4, layout, -1.0)
            cols = tuple(x + h2 * kv for x, kv in zip(cols, k2))
        return cols, None

    cols = tuple(uc[:, i] for i in range(8))
    n_it = K // span
    cols, _ = jax.lax.scan(fused, cols, jnp.arange(n_it), unroll=unroll)
    return jnp.stack(cols, axis=1)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    ext = 5e-3
    d = ScalarDomain(2 * ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    lay = layout_of(d)
    # K multiple of 4 so baseline and fused cover identical slabs
    K = dim - (dim % 4)
    sp = build_segment_pack_device(d, K=K, dtype=jnp.bfloat16)
    s0 = init_beam(jax.random.PRNGKey(0), rays, 2e-3, 0.0, ext,
                   "circular")
    s = jnp.asarray(s0)
    u = jnp.stack([s[0], s[1], s[3], s[4], s[5], s[6], s[7], s[8]],
                  axis=1)
    dp = jnp.float32(sp.dp)

    def timed(fn, reps=5):
        out = fn()
        out.block_until_ready()
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return out, best

    base_fn = lambda: trace_zscan_segments(
        u, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab, dp,
        shape_ab=sp.shape_ab, layout=lay, K=sp.K,
        n_seg=sp.seg_planes.shape[0], integrator="rk2s2",
        weights="slab", ray_chunk=None)
    out_b, t_b = timed(base_fn)
    print(f"baseline rk2s2/slab: {t_b*1e3:.2f} ms  "
          f"{rays/t_b/1e6:.2f} M rays/s", flush=True)

    for body in (2, 4):
        if K % (2 * body):
            continue
        fn = lambda b=body: march_pair2(
            u, sp.seg_planes[0], sp.origin_ab,
            jnp.asarray(sp.inv_spacing_ab), dp, shape_ab=sp.shape_ab,
            layout=lay, K=K, C=sp.seg_planes.shape[-1] // (sp.K + 1),
            body=b)
        out_f, t_f = timed(fn)
        import numpy as np
        diff = float(np.max(np.abs(np.asarray(out_f) - np.asarray(out_b))))
        print(f"fused body={body}: {t_f*1e3:.2f} ms  "
              f"{rays/t_f/1e6:.2f} M rays/s  maxdiff={diff:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
