"""Round 2 of pallas march variants.

  F. flat gather only (contiguous rows, no transpose) — the input-path
     floor the kernel variant pays on top of.
  G. full path with in-kernel VMEM transpose at B=256 (E retry: halved
     blocks to fit VMEM with double buffering)
  H. kernel-only at B=256 (pipelining granularity effect)
  I. kernel-only with approx reciprocal + 1 Newton step for 1/vp
     (exactness vs march checked; divides are ~2/pair/ray = 512/ray)
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


def gather_T(u, seg):
    ia0, ib0 = corner_indices(u)
    base = ia0 * nb + ib0
    cs = [jnp.take(seg, base + off, axis=0, mode="clip").T
          for off in (0, 1, nb, nb + 1)]
    return (ia0.astype(jnp.float32)[None, :],
            ib0.astype(jnp.float32)[None, :], *cs)


def gather_flat(u, seg):
    ia0, ib0 = corner_indices(u)
    base = ia0 * nb + ib0
    cs = [jnp.take(seg, base + off, axis=0, mode="clip")
          for off in (0, 1, nb, nb + 1)]
    return (ia0.astype(jnp.float32)[None, :],
            ib0.astype(jnp.float32)[None, :], *cs)


def make_kernel(transpose_in_kernel, approx_recip=False):
    def kernel(scal_ref, u_ref, ia_ref, ib_ref, c00, c01, c10, c11,
               out_ref, *scr):
        oa, ob = scal_ref[0], scal_ref[1]
        iva, ivb = scal_ref[2], scal_ref[3]
        h = scal_ref[4]
        iaf = ia_ref[0, :]
        ibf = ib_ref[0, :]
        if transpose_in_kernel:
            t00, t01, t10, t11 = scr
            t00[:] = c00[:].T
            t01[:] = c01[:].T
            t10[:] = c10[:].T
            t11[:] = c11[:].T
            r00, r01, r10, r11 = t00, t01, t10, t11
        else:
            r00, r01, r10, r11 = c00, c01, c10, c11
        state = tuple(u_ref[i, :] for i in range(8))

        def recip(x):
            if not approx_recip:
                return 1.0 / x
            r = pl.reciprocal(x, approx=True)
            return r * (2.0 - x * r)      # one Newton step

        def pair(j, st):
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
            r0 = 2 * C * j
            win00 = r00[r0:r0 + 2 * C, :].astype(jnp.float32)
            win01 = r01[r0:r0 + 2 * C, :].astype(jnp.float32)
            win10 = r10[r0:r0 + 2 * C, :].astype(jnp.float32)
            win11 = r11[r0:r0 + 2 * C, :].astype(jnp.float32)

            def vals(row):
                return (w00 * win00[row, :] + w01 * win01[row, :]
                        + w10 * win10[row, :] + w11 * win11[row, :])

            def rhs(stt, off):
                inv_vp = recip(stt[4])
                return (stt[2] * inv_vp, stt[3] * inv_vp,
                        vals(off + 0) * inv_vp, vals(off + 1) * inv_vp,
                        vals(off + 2) * inv_vp)

            live = (a, b, va, vb, vp)
            k1 = rhs(live, 0)
            mid = tuple(x + h * kv for x, kv in zip(live, k1))
            k2 = rhs(mid, C)
            new = tuple(x + 2.0 * h * kv for x, kv in zip(live, k2))
            return (*new, amp, ph, pol)

        for j in range(K // 2):
            state = pair(j, state)
        for i in range(8):
            out_ref[i, :] = state[i]

    return kernel


scal_host = jnp.stack([origin_ab[0], origin_ab[1], inv_ab[0], inv_ab[1],
                       dp]).astype(jnp.float32)


def pallas_march(ut, ia, ib, corners, transposed, B, approx=False):
    shape = (rows, B) if transposed else (B, rows)
    idx = (lambda i: (0, i)) if transposed else (lambda i: (i, 0))
    cspec = pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)
    scratch = ([] if transposed else
               [pltpu.VMEM((rows, B), jnp.bfloat16) for _ in range(4)])
    return pl.pallas_call(
        make_kernel(not transposed, approx),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec, cspec,
        ],
        out_specs=pl.BlockSpec((8, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=scratch,
    )(scal_host, ut, ia, ib, *corners)


@jax.jit
def gather_flat_only(u, seg):
    parts = gather_flat(u, seg)
    return sum(p[:, 0].astype(jnp.float32).sum() for p in parts[2:])


@jax.jit
def full_flat_256(u, seg):
    ia, ib, *cs = gather_flat(u, seg)
    return pallas_march(u.T, ia, ib, cs, False, 256).T


@partial(jax.jit, static_argnames=("B", "approx"))
def kernel_only_T(ut, ia, ib, c0, c1, c2, c3, B=512, approx=False):
    return pallas_march(ut, ia, ib, (c0, c1, c2, c3), True, B, approx)


ref_fn = jax.jit(partial(
    march_segment, shape_ab=spack.shape_ab, layout=layout, K=K, C=C,
    integrator="rk2s2", weights="slab"))


def bench(fn, *args, n=5, **kw):
    r = fn(*args, **kw); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


uf_r = ref_fn(u, seg, origin_ab, inv_ab, dp)
jax.block_until_ready(uf_r)

tF = bench(gather_flat_only, u, seg)
print(json.dumps({"variant": "F_gather_flat_only",
                  "ms": round(tF*1e3, 2)}), flush=True)

try:
    uf_g = full_flat_256(u, seg)
    errG = float(jnp.abs(uf_g - uf_r).max())
    tG = bench(full_flat_256, u, seg)
    print(json.dumps({"variant": "G_full_vmemT_B256",
                      "ms": round(tG*1e3, 2),
                      "Mrays_s": round(N/tG/1e6, 3), "max_err": errG}),
          flush=True)
except Exception as e:
    print(json.dumps({"variant": "G_full_vmemT_B256",
                      "error": repr(e)[:200]}), flush=True)

ia, ib, *cs = jax.jit(gather_T)(u, seg)
cs = [jax.device_put(c) for c in cs]
ut = u.T
jax.block_until_ready(cs)

tH = bench(kernel_only_T, ut, ia, ib, *cs, B=256)
print(json.dumps({"variant": "H_kernel_only_B256",
                  "ms": round(tH*1e3, 2),
                  "Mrays_s": round(N/tH/1e6, 3)}), flush=True)

uf_i = kernel_only_T(ut, ia, ib, *cs, B=512, approx=True)
# compare against exact kernel for the live columns
uf_c = kernel_only_T(ut, ia, ib, *cs, B=512, approx=False)
errI = float(jnp.abs(uf_i - uf_c).max())
tI = bench(kernel_only_T, ut, ia, ib, *cs, B=512, approx=True)
print(json.dumps({"variant": "I_kernel_approx_recip_B512",
                  "ms": round(tI*1e3, 2),
                  "Mrays_s": round(N/tI/1e6, 3),
                  "max_err_vs_exact_kernel": errI}), flush=True)
