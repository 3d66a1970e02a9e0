"""Prototype: Pallas TPU kernel for the rk2s2 slab-pair march (weights=slab).

Hypothesis: the segmented march is VPU-bound but pays ~44ms/63ms of XLA
while-loop + dynamic-slice + copy overhead per 262k-ray chunk
(scratch/profile_r3.py).  A pallas_call with the 4 corner tables blocked
into VMEM and the whole K-slab fori_loop INSIDE the kernel removes all
three: corners are read from HBM exactly once, state lives in registers,
and there is no per-slab XLA loop machinery.

v0 scope: rk2s2, weights="slab", C=3 (pure shadowgraphy layout), K even.
Corners are gathered by XLA as today, then passed TRANSPOSED
((K+1)*C, N) so the kernel's per-pair window read is a sublane slice.
Numerics must match march_segment to fp tolerance (same formulas, same
frozen-corner convention).
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

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
ext = 5e-3

dom = ScalarDomain(2 * ext, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
spack = build_segment_pack_device(dom, K=DIM, dtype=jnp.bfloat16)
layout = layout_of(dom)
K = spack.K
C = spack.seg_planes.shape[-1] // (K + 1)
na, nb = spack.shape_ab
assert C == 3 and K % 2 == 0, (C, K)
seg = spack.seg_planes[0]
origin_ab = spack.origin_ab
inv_ab = spack.inv_spacing_ab
dp = jnp.float32(spack.dp)

s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, ext, "circular")
# permuted state (N, 8): a, b, va, vb, vp, amp, ph, pol  (probing z)
u = jnp.stack([s0[0], s0[1], s0[3], s0[4], s0[5], s0[6], s0[7], s0[8]],
              axis=1).astype(jnp.float32)


def march_pallas(u, seg):
    """March all N rays through the single whole-trace segment."""
    ta = (u[:, 0] - origin_ab[0]) * inv_ab[0]
    tb = (u[:, 1] - origin_ab[1]) * inv_ab[1]
    ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
    ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
    base = ia0 * nb + ib0
    corners = [jnp.take(seg, base + off, axis=0, mode="clip").T
               for off in (0, 1, nb, nb + 1)]     # ((K+1)*C, N) bf16
    ut = u.T                                       # (8, N)
    iaf = ia0.astype(jnp.float32)[None, :]         # (1, N)
    ibf = ib0.astype(jnp.float32)[None, :]
    scal = jnp.stack([origin_ab[0], origin_ab[1], inv_ab[0], inv_ab[1],
                      dp]).astype(jnp.float32)

    rows = (K + 1) * C

    def kernel(scal_ref, u_ref, ia_ref, ib_ref, c00, c01, c10, c11,
               out_ref):
        oa = scal_ref[0]
        ob = scal_ref[1]
        iva = scal_ref[2]
        ivb = scal_ref[3]
        h = scal_ref[4]
        iaf = ia_ref[0, :]
        ibf = ib_ref[0, :]
        state = tuple(u_ref[i, :] for i in range(8))

        def pair(j, st):
            a, b, va, vb, vp, amp, ph, pol = st
            # per-pair transverse weights from the pair-start position
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
            win00 = c00[r0:r0 + 2 * C, :].astype(jnp.float32)
            win01 = c01[r0:r0 + 2 * C, :].astype(jnp.float32)
            win10 = c10[r0:r0 + 2 * C, :].astype(jnp.float32)
            win11 = c11[r0:r0 + 2 * C, :].astype(jnp.float32)

            def vals(row):
                return (w00 * win00[row, :] + w01 * win01[row, :]
                        + w10 * win10[row, :] + w11 * win11[row, :])

            def rhs(stt, off):
                aa, bb, vva, vvb, vvp = stt[0], stt[1], stt[2], stt[3], stt[4]
                del aa, bb
                inv_vp = 1.0 / vvp
                return (vva * inv_vp, vvb * inv_vp,
                        vals(off + 0) * inv_vp, vals(off + 1) * inv_vp,
                        vals(off + 2) * inv_vp)

            live = (a, b, va, vb, vp)
            k1 = rhs(live, 0)
            mid = tuple(x + h * kv for x, kv in zip(live, k1))
            k2 = rhs(mid, C)
            h2 = 2.0 * h
            new = tuple(x + h2 * kv for x, kv in zip(live, k2))
            return (*new, amp, ph, pol)

        # STATIC unroll: Mosaic cannot prove dynamic sublane offsets
        # aligned; the windows are disjoint consecutive 6-row blocks, so
        # a python loop gives static slices and zero loop machinery.
        for j in range(K // 2):
            state = pair(j, state)
        for i in range(8):
            out_ref[i, :] = state[i]

    grid = (N // B,)
    cspec = pl.BlockSpec((rows, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
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
    )(scal, ut, iaf, ibf, *corners)
    return out.T


jit_pallas = jax.jit(march_pallas)
print("compiling pallas march...", flush=True)
t0 = time.perf_counter()
uf_p = jit_pallas(u, seg)
uf_p.block_until_ready()
print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

# reference: march_segment rk2s2 weights=slab
ref_fn = jax.jit(partial(
    march_segment, shape_ab=spack.shape_ab, layout=layout, K=K, C=C,
    integrator="rk2s2", weights="slab"))
uf_r = ref_fn(u, seg, origin_ab, inv_ab, dp)
uf_r.block_until_ready()

err = jnp.abs(uf_p - uf_r).max(axis=0)
print("max abs err per col:", np.asarray(err), flush=True)
rel = float(jnp.abs(uf_p[:, :5] - uf_r[:, :5]).max()
            / (jnp.abs(uf_r[:, :5]).max() + 1e-30))
print("rel err (live cols):", rel, flush=True)

def bench(fn, *args):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        r.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)

tp = bench(jit_pallas, u, seg)
tr = bench(ref_fn, u, seg, origin_ab, inv_ab, dp)
print(json.dumps({
    "dim": DIM, "N": N, "B": B, "K": K,
    "pallas_ms": round(tp * 1e3, 2),
    "march_segment_ms": round(tr * 1e3, 2),
    "pallas_Mrays_s": round(N / tp / 1e6, 3),
    "march_Mrays_s": round(N / tr / 1e6, 3),
    "speedup": round(tr / tp, 3),
    "rel_err": rel,
}), flush=True)
