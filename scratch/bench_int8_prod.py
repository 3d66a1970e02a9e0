"""Production-shaped int8 vs bf16: 4M rays, lax.map over 262k chunks."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      march_segment)
from synthpy_tpu.fields.domain import layout_of

DIM, N, CHUNK = 512, 4_194_304, 262144
ext = 5e-3
dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
spack = build_segment_pack_device(dom, K=DIM, dtype=jnp.bfloat16)
layout = layout_of(dom)
K = spack.K
C = spack.seg_planes.shape[-1] // (K + 1)
na, nb = spack.shape_ab
seg = spack.seg_planes[0]
origin_ab, inv_ab = spack.origin_ab, spack.inv_spacing_ab
dp = jnp.float32(spack.dp)

s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, ext, "circular")
u = jnp.stack([s0[0], s0[1], s0[3], s0[4], s0[5], s0[6], s0[7], s0[8]],
              axis=1).astype(jnp.float32)


@jax.jit
def quantize(seg):
    v = seg.reshape(na * nb, K + 1, C).astype(jnp.float32)
    amax = jnp.max(jnp.abs(v), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(v / scale[None]), -127, 127).astype(jnp.int8)
    return q.reshape(na * nb, (K + 1) * C), scale


seg_q, scale = quantize(seg)
jax.block_until_ready(seg_q)


def march_int8_chunk(uc, seg_q, scale):
    ta = (uc[:, 0] - origin_ab[0]) * inv_ab[0]
    tb = (uc[:, 1] - origin_ab[1]) * inv_ab[1]
    ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
    ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
    base = ia0 * nb + ib0
    corners = tuple(jnp.take(seg_q, base + off, axis=0, mode="clip")
                    for off in (0, 1, nb, nb + 1))
    ia0f = ia0.astype(uc.dtype)
    ib0f = ib0.astype(uc.dtype)
    h = dp
    cols = tuple(uc[:, i] for i in range(8))

    def slab_pair(cols, j):
        k = 2 * j
        wins = tuple(
            jax.lax.dynamic_slice_in_dim(c, k * C, 2 * C, axis=1)
            .astype(jnp.float32) for c in corners)
        sc = jax.lax.dynamic_slice_in_dim(scale, k, 2, axis=0)
        scf = sc.reshape(2 * C)[None, :]
        wins = tuple(w * scf for w in wins)
        w0 = tuple(win[:, :C] for win in wins)
        wm = tuple(win[:, C:] for win in wins)
        a, b = cols[0], cols[1]
        taa = (a - origin_ab[0]) * inv_ab[0]
        tbb = (b - origin_ab[1]) * inv_ab[1]
        inside = ((taa >= 0) & (taa <= na - 1) & (tbb >= 0)
                  & (tbb <= nb - 1))
        m = inside.astype(a.dtype)
        fa = jnp.clip(taa - ia0f, 0.0, 1.0)
        fb = jnp.clip(tbb - ib0f, 0.0, 1.0)
        w4 = (m * (1 - fa) * (1 - fb), m * (1 - fa) * fb,
              m * fa * (1 - fb), m * fa * fb)

        def stage(cc, wv):
            w00, w01, w10, w11 = w4
            v00, v01, v10, v11 = wv
            vals = (w00[:, None] * v00 + w01[:, None] * v01
                    + w10[:, None] * v10 + w11[:, None] * v11)
            _, _, va, vb, vp, *_ = cc
            inv_vp = 1.0 / vp
            z = jnp.zeros_like(vp)
            return (va * inv_vp, vb * inv_vp, vals[:, 0] * inv_vp,
                    vals[:, 1] * inv_vp, vals[:, 2] * inv_vp, z, z, z)

        k1 = stage(cols, w0)
        k2 = stage(tuple(x + h * kv for x, kv in zip(cols, k1)), wm)
        return tuple(x + 2.0 * h * kv
                     for x, kv in zip(cols, k2)), None

    cols, _ = jax.lax.scan(slab_pair, cols, jnp.arange(K // 2), unroll=2)
    return jnp.stack(cols, axis=1)


@jax.jit
def run_int8(u, seg_q, scale):
    blocks = u.reshape(N // CHUNK, CHUNK, 8)
    out = jax.lax.map(lambda b: march_int8_chunk(b, seg_q, scale), blocks)
    return out.reshape(N, 8)


@jax.jit
def run_bf16(u, seg):
    blocks = u.reshape(N // CHUNK, CHUNK, 8)
    f = partial(march_segment, seg=None, origin_ab=origin_ab,
                inv_ab=inv_ab, dp=dp, shape_ab=spack.shape_ab,
                layout=layout, K=K, C=C, integrator="rk2s2",
                weights="slab")
    out = jax.lax.map(
        lambda b: march_segment(b, seg, origin_ab, inv_ab, dp,
                                shape_ab=spack.shape_ab, layout=layout,
                                K=K, C=C, integrator="rk2s2",
                                weights="slab"), blocks)
    return out.reshape(N, 8)


def bench(fn, *args, n=3):
    r = fn(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


tb = bench(run_bf16, u, seg)
print(json.dumps({"variant": "prod_bf16", "ms": round(tb*1e3, 1),
                  "Mrays_s": round(N/tb/1e6, 3)}), flush=True)
tq = bench(run_int8, u, seg_q, scale)
print(json.dumps({"variant": "prod_int8", "ms": round(tq*1e3, 1),
                  "Mrays_s": round(N/tq/1e6, 3),
                  "speedup": round(tb/tq, 3)}), flush=True)
