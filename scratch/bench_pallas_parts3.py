"""Round 3: pair-group grid (streamed corner windows) + honest gather cost.

  K. gather-only, measured honestly (jit returns the 4 gathered arrays)
  L. paired gather: one lax.gather of (2, rows) contiguous row-pairs per
     transverse side (2 gathers instead of 4 takes)
  J. pallas march with grid=(ray_blocks, pair_groups): corner windows
     (6*G_PAIRS, B) streamed per group, state accumulated in the
     revisited output block -> VMEM per step ~8x smaller, so B=1024/2048
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import (build_segment_pack_device,
                                      march_segment)
from synthpy_tpu.fields.domain import layout_of

DIM, N = 512, 262144
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
rows = (K + 1) * C

s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, ext, "circular")
u = jnp.stack([s0[0], s0[1], s0[3], s0[4], s0[5], s0[6], s0[7], s0[8]],
              axis=1).astype(jnp.float32)


def corner_indices(u):
    ta = (u[:, 0] - origin_ab[0]) * inv_ab[0]
    tb = (u[:, 1] - origin_ab[1]) * inv_ab[1]
    ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
    ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
    return ia0, ib0


@jax.jit
def gather_T4(u, seg):
    ia0, ib0 = corner_indices(u)
    base = ia0 * nb + ib0
    return tuple(jnp.take(seg, base + off, axis=0, mode="clip").T
                 for off in (0, 1, nb, nb + 1))


@jax.jit
def gather_flat4(u, seg):
    ia0, ib0 = corner_indices(u)
    base = ia0 * nb + ib0
    return tuple(jnp.take(seg, base + off, axis=0, mode="clip")
                 for off in (0, 1, nb, nb + 1))


@jax.jit
def gather_pairs(u, seg):
    """(N, 2, rows) contiguous row-pair gathers for b and b+1 sides."""
    ia0, ib0 = corner_indices(u)
    base = ia0 * nb + ib0
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    def gat(idx):
        return jax.lax.gather(
            seg, idx[:, None], dn, slice_sizes=(2, rows),
            mode=jax.lax.GatherScatterMode.CLIP)
    return gat(base), gat(base + nb)   # each (N, 2, rows)


def bench(fn, *args, n=5, **kw):
    r = fn(*args, **kw); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


tK1 = bench(gather_flat4, u, seg)
print(json.dumps({"variant": "K_gather_flat_return",
                  "ms": round(tK1*1e3, 2)}), flush=True)
tK2 = bench(gather_T4, u, seg)
print(json.dumps({"variant": "K_gather_T_return",
                  "ms": round(tK2*1e3, 2)}), flush=True)
try:
    tL = bench(gather_pairs, u, seg)
    print(json.dumps({"variant": "L_gather_rowpairs",
                      "ms": round(tL*1e3, 2)}), flush=True)
except Exception as e:
    print(json.dumps({"variant": "L_gather_rowpairs",
                      "error": repr(e)[:200]}), flush=True)


# ---- J: pair-group grid ----------------------------------------------
def make_kernel_j(G_PAIRS):
    def kernel(scal_ref, u_ref, ia_ref, ib_ref, c00, c01, c10, c11,
               out_ref):
        oa, ob = scal_ref[0], scal_ref[1]
        iva, ivb = scal_ref[2], scal_ref[3]
        h = scal_ref[4]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = u_ref[:]

        iaf = ia_ref[0, :]
        ibf = ib_ref[0, :]
        state = tuple(out_ref[i, :] for i in range(8))

        def pair(jj, st):
            a, b, va, vb, vp, amp, ph, pol = st
            ta = (a - oa) * iva
            tb = (b - ob) * ivb
            inside = ((ta >= 0.0) & (ta <= na - 1.0)
                      & (tb >= 0.0) & (tb <= nb - 1.0))
            m = inside.astype(jnp.float32)
            fa = jnp.clip(ta - iaf, 0.0, 1.0)
            fb = jnp.clip(tb - ibf, 0.0, 1.0)
            w00 = m * (1 - fa) * (1 - fb)
            w01 = m * (1 - fa) * fb
            w10 = m * fa * (1 - fb)
            w11 = m * fa * fb
            r0 = 2 * C * jj
            win00 = c00[r0:r0 + 2 * C, :].astype(jnp.float32)
            win01 = c01[r0:r0 + 2 * C, :].astype(jnp.float32)
            win10 = c10[r0:r0 + 2 * C, :].astype(jnp.float32)
            win11 = c11[r0:r0 + 2 * C, :].astype(jnp.float32)

            def vals(row):
                return (w00 * win00[row, :] + w01 * win01[row, :]
                        + w10 * win10[row, :] + w11 * win11[row, :])

            def rhs(stt, off):
                inv_vp = 1.0 / stt[4]
                return (stt[2] * inv_vp, stt[3] * inv_vp,
                        vals(off + 0) * inv_vp, vals(off + 1) * inv_vp,
                        vals(off + 2) * inv_vp)

            live = (a, b, va, vb, vp)
            k1 = rhs(live, 0)
            mid = tuple(x + h * kv for x, kv in zip(live, k1))
            k2 = rhs(mid, C)
            new = tuple(x + 2.0 * h * kv for x, kv in zip(live, k2))
            return (*new, amp, ph, pol)

        for jj in range(G_PAIRS):
            state = pair(jj, state)
        for i in range(8):
            out_ref[i, :] = state[i]

    return kernel


scal_host = jnp.stack([origin_ab[0], origin_ab[1], inv_ab[0], inv_ab[1],
                       dp]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("B", "G_PAIRS"))
def pallas_march_j(ut, ia, ib, c0, c1, c2, c3, B=1024, G_PAIRS=32):
    n_groups = (K // 2) // G_PAIRS
    grows = 2 * C * G_PAIRS
    cspec = pl.BlockSpec((grows, B), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((8, B), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, B), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel_j(G_PAIRS),
        grid=(N // B, n_groups),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  bspec, ispec, ispec, cspec, cspec, cspec, cspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    )(scal_host, ut, ia, ib, c0, c1, c2, c3)


ref_fn = jax.jit(partial(
    march_segment, shape_ab=spack.shape_ab, layout=layout, K=K, C=C,
    integrator="rk2s2", weights="slab"))
uf_r = ref_fn(u, seg, origin_ab, inv_ab, dp)
jax.block_until_ready(uf_r)

ia0, ib0 = jax.jit(corner_indices)(u)
ia = ia0.astype(jnp.float32)[None, :]
ib = ib0.astype(jnp.float32)[None, :]
cs = gather_T4(u, seg)
ut = u.T
jax.block_until_ready(cs)

for B, G in ((1024, 32), (2048, 32), (2048, 16), (1024, 64), (512, 32)):
    if rows % (2 * C * G):
        continue
    try:
        out = pallas_march_j(ut, ia, ib, *cs, B=B, G_PAIRS=G)
        err = float(jnp.abs(out.T - uf_r).max())
        t = bench(pallas_march_j, ut, ia, ib, *cs, B=B, G_PAIRS=G)
        print(json.dumps({"variant": f"J_groupgrid_B{B}_G{G}",
                          "ms": round(t*1e3, 2),
                          "Mrays_s": round(N/t/1e6, 3),
                          "max_err": err}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": f"J_groupgrid_B{B}_G{G}",
                          "error": repr(e)[:200]}), flush=True)
