"""Where does the pallas march v0 spend time? kernel vs gather vs transpose.

Variants at 512^3 / 262k rays / K=512 / rk2s2 / weights=slab:
  A. march_segment (baseline, gather inside)
  B. full pallas path (gather + transpose + kernel)
  C. kernel only (corners pre-gathered AND pre-transposed)
  D. gather+transpose only (no kernel)
  E. kernel with in-VMEM per-block transpose (corners pre-gathered,
     UNtransposed (N, cols) blocks; kernel transposes each block once)
Run each serially on the one chip; print a JSON line per variant.
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

DIM, N, B = 512, 262144, 512
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


def make_kernel(transpose_in_kernel):
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

        for j in range(K // 2):
            state = pair(j, state)
        for i in range(8):
            out_ref[i, :] = state[i]

    return kernel


scal_host = jnp.stack([origin_ab[0], origin_ab[1], inv_ab[0], inv_ab[1],
                       dp]).astype(jnp.float32)


def pallas_march(ut, ia, ib, corners, transposed):
    shape = (rows, B) if transposed else (B, rows)
    idx = (lambda i: (0, i)) if transposed else (lambda i: (i, 0))
    cspec = pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)
    scratch = ([] if transposed else
               [pltpu.VMEM((rows, B), jnp.bfloat16) for _ in range(4)])
    return pl.pallas_call(
        make_kernel(not transposed),
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
def full_T(u, seg):
    ia, ib, *cs = gather_T(u, seg)
    return pallas_march(u.T, ia, ib, cs, True).T


@jax.jit
def kernel_only_T(ut, ia, ib, c0, c1, c2, c3):
    return pallas_march(ut, ia, ib, (c0, c1, c2, c3), True)


@jax.jit
def gather_only(u, seg):
    parts = gather_T(u, seg)
    return sum(p[0, :].astype(jnp.float32).sum() for p in parts[2:])


@jax.jit
def full_flat(u, seg):
    ia, ib, *cs = gather_flat(u, seg)
    return pallas_march(u.T, ia, ib, cs, False).T


ref_fn = jax.jit(partial(
    march_segment, shape_ab=spack.shape_ab, layout=layout, K=K, C=C,
    integrator="rk2s2", weights="slab"))


def bench(fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


print("compiling/benching A (march_segment)...", flush=True)
tA = bench(ref_fn, u, seg, origin_ab, inv_ab, dp)
print(json.dumps({"variant": "A_march_segment", "ms": round(tA*1e3, 2),
                  "Mrays_s": round(N/tA/1e6, 3)}), flush=True)

print("compiling/benching B (pallas full, pre-T)...", flush=True)
uf_r = ref_fn(u, seg, origin_ab, inv_ab, dp)
uf_p = full_T(u, seg)
err = float(jnp.abs(uf_p - uf_r).max())
tB = bench(full_T, u, seg)
print(json.dumps({"variant": "B_pallas_fullT", "ms": round(tB*1e3, 2),
                  "Mrays_s": round(N/tB/1e6, 3), "max_err": err}),
      flush=True)

print("compiling/benching C (kernel only)...", flush=True)
ia, ib, *cs = jax.jit(gather_T)(u, seg)
cs = [jax.device_put(c) for c in cs]
ut = u.T
tC = bench(kernel_only_T, ut, ia, ib, *cs)
print(json.dumps({"variant": "C_kernel_only", "ms": round(tC*1e3, 2),
                  "Mrays_s": round(N/tC/1e6, 3)}), flush=True)

print("compiling/benching D (gather+transpose only)...", flush=True)
tD = bench(gather_only, u, seg)
print(json.dumps({"variant": "D_gatherT_only", "ms": round(tD*1e3, 2)}),
      flush=True)

print("compiling/benching E (in-kernel transpose)...", flush=True)
try:
    uf_e = full_flat(u, seg)
    errE = float(jnp.abs(uf_e - uf_r).max())
    tE = bench(full_flat, u, seg)
    print(json.dumps({"variant": "E_vmem_transpose", "ms": round(tE*1e3, 2),
                      "Mrays_s": round(N/tE/1e6, 3), "max_err": errE}),
          flush=True)
except Exception as e:
    print(json.dumps({"variant": "E_vmem_transpose",
                      "error": repr(e)[:300]}), flush=True)
