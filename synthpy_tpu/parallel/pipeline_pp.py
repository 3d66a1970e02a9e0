"""Pipeline-parallel segment tracing: the field sharded by probing depth.

The missing axis from the reference's parallelism menu (SURVEY.md 2.5
lists PP as "none"): for fields too large for one chip's HBM, shard the
SEGMENTS of the gather-hoisted tracer across a mesh axis — device d owns
the probing-axis range [d, d+1) * n_seg/D — and stream ray chunks through
the devices in probing order with ppermute handoffs. This is the
device-mesh version of the reference's host-side "auto-batching" slab
decomposition with ray re-injection (domain.py:140-227,
propagator.py:366-450), executed as one XLA program.

Classic 1F pipeline schedule: chunk c is processed by device d at macro
step c + d; with M chunks and D devices the schedule runs M + D - 1 steps
at M/(M+D-1) efficiency. Each device holds only its segment shard (field
memory scales 1/D).

The per-segment arithmetic is :func:`synthpy_tpu.tracer.zscan.
march_segment` — the SAME function the single-chip tracer scans over —
so the PP path carries every single-chip optimisation (columnized tuple
state, flat-corner slicing, hoisted z-blends, rk2/rk2s2) and stays
bit-identical to ``trace_zscan_segments`` by construction.

Ray-chunk storage is sharded too whenever ``n_chunks`` divides by the
axis size: the input chunks live as a P(axis)-sharded (M, R, 8) array
(device d owns chunks [d*M/D, (d+1)*M/D)), each macro step moves exactly
one chunk to device 0 with a chunk-sized psum (negligible next to the
K*segs_local march work), and finished chunks are psum-broadcast from the
last device and written into the owner's output shard — so RAY memory
also scales 1/D instead of every device holding every chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from synthpy_tpu.fields.domain import ChannelLayout
from synthpy_tpu.tracer.zscan import SegmentPack, march_segment


def make_pipelined_segment_tracer(
    mesh: Mesh,
    layout: ChannelLayout,
    spack: SegmentPack,
    n_chunks: int,
    substeps: int = 1,
    atten_sign: float = -1.0,
    axis: str = "seg",
    integrator: str = "rk4",
    unroll: int = 2,
    shard_chunks: bool | None = None,
    weights: str = "stage",
    n_seg_real: int | None = None,
):
    """Build a jitted PP tracer over ``axis`` of ``mesh``.

    The returned function has signature
    ``f(chunks, seg_planes, origin_ab, inv_ab, dp) -> chunks_out``
    (for an int8 ``spack`` — SegmentPack.scales set — the
    (n_seg, K+1, C) scales table is an extra argument after
    ``seg_planes``, sharded over the same segment axis) where
    ``chunks`` is (n_chunks, chunk_rays, 8) permuted ray state and
    ``seg_planes`` the full (n_seg, nab, (K+1)C) table (GSPMD shards it
    over ``axis``). ``integrator``: "rk4" (parity), "rk2" (midpoint) or
    "rk2s2" (stride-2 midpoint, the production fast mode) — identical
    semantics to ``trace_zscan_segments`` because both run
    :func:`march_segment`. ``shard_chunks`` (default: auto — on whenever
    ``n_chunks % D == 0``) shards chunk storage over ``axis`` so per-
    device ray memory is M/D chunks; the output is then returned with the
    same sharding.
    """
    if integrator not in ("rk4", "rk2", "rk2s2", "rk2s4"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if integrator != "rk4" and substeps != 1:
        raise ValueError(f"integrator={integrator!r} requires substeps=1")
    quantized = getattr(spack, "scales", None) is not None
    qbits = getattr(spack, "qbits", None)
    D = mesh.shape[axis]
    n_seg = spack.seg_planes.shape[0]
    assert n_seg % D == 0, f"n_seg {n_seg} must divide over {D} devices"
    segs_local = n_seg // D
    # n_seg_real < n_seg: the tail segments are zero padding added so
    # n_seg divides over the axis (pipeline.run(pp_axis=) does this).
    # They are SKIPPED, not marched: marching zero field is physically a
    # straight flight but accumulates one f32 rounding per slab in the
    # position columns, which is enough to move rays across detector
    # cells — the skip keeps the PP march bit-identical to single-chip.
    if n_seg_real is None:
        n_seg_real = n_seg
    K = spack.K
    from synthpy_tpu.tracer.zscan import _plane_blocks
    C = spack.seg_planes.shape[-1] // _plane_blocks(K, qbits)
    shape_ab = spack.shape_ab
    M = n_chunks
    if shard_chunks is None:
        shard_chunks = M % D == 0
    if shard_chunks and M % D != 0:
        raise ValueError(f"shard_chunks needs n_chunks {M} % D {D} == 0")
    M_local = M // D if shard_chunks else M

    def local_fn(chunks, seg_local, scales_local, origin_ab, inv_ab, dp):
        d = jax.lax.axis_index(axis)
        chunk_rays = chunks.shape[1]
        T = M + D - 1

        def march(u):
            """One ray chunk through this device's resident segments."""
            def seg_step(uc, s):
                seg = jax.lax.dynamic_slice_in_dim(seg_local, s, 1,
                                                   axis=0)[0]
                sc = (None if scales_local is None else
                      jax.lax.dynamic_slice_in_dim(scales_local, s, 1,
                                                   axis=0)[0])
                out = march_segment(
                    uc, seg, origin_ab, inv_ab, dp, shape_ab=shape_ab,
                    layout=layout, K=K, C=C, substeps=substeps,
                    atten_sign=atten_sign, integrator=integrator,
                    unroll=unroll, weights=weights, scales=sc,
                    qbits=qbits)
                if n_seg_real < n_seg:
                    real = (d * segs_local + s) < n_seg_real
                    out = jnp.where(real, out, uc)
                return out, None

            u, _ = jax.lax.scan(seg_step, u, jnp.arange(segs_local))
            return u

        perm = [(i, (i + 1) % D) for i in range(D)]

        def macro_step(carry, t):
            buf, out = carry
            # device 0 injects chunk t (if it exists)
            if shard_chunks:
                # chunk t lives on device t // M_local: its owner
                # contributes it, the psum delivers it everywhere, and
                # device 0 keeps it
                own = (t // M_local) == d
                slot = jnp.where(own, t - d * M_local, 0)
                cand = jax.lax.dynamic_slice_in_dim(chunks, slot, 1,
                                                    axis=0)[0]
                fresh = jax.lax.psum(
                    jnp.where(jnp.logical_and(own, t < M), cand, 0.0),
                    axis)
            else:
                inject = jnp.where(t < M, t, 0)
                fresh = jax.lax.dynamic_slice_in_dim(chunks, inject, 1,
                                                     axis=0)[0]
            buf = jnp.where(jnp.logical_and(d == 0, t < M), fresh, buf)
            # active devices process their resident chunk
            c_idx = t - d
            active = (c_idx >= 0) & (c_idx < M)
            processed = march(buf)
            buf = jnp.where(active, processed, buf)
            # the last device finishes chunk t - (D-1) this step
            fin_idx = t - (D - 1)
            fin_ok = (fin_idx >= 0) & (fin_idx < M)
            if shard_chunks:
                fin = jax.lax.psum(
                    jnp.where(jnp.logical_and(d == D - 1, fin_ok),
                              buf, 0.0), axis)
                own_out = (fin_idx // M_local) == d
                slot_o = jnp.where(own_out, fin_idx - d * M_local, 0)
                cur = jax.lax.dynamic_slice_in_dim(out, slot_o, 1,
                                                   axis=0)[0]
                new = jnp.where(jnp.logical_and(own_out, fin_ok), fin,
                                cur)
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, new[None], slot_o, axis=0)
            else:
                slot = jnp.where(fin_ok, fin_idx, 0)
                contrib = jnp.where(jnp.logical_and(d == D - 1, fin_ok),
                                    buf, 0.0)
                out = jax.lax.dynamic_update_slice_in_dim(
                    out,
                    (jax.lax.dynamic_slice_in_dim(out, slot, 1,
                                                  axis=0)[0]
                     + contrib)[None],
                    slot, axis=0)
            # hand the chunk to the next device
            buf = jax.lax.ppermute(buf, axis, perm)
            return (buf, out), None

        buf0 = jnp.zeros((chunk_rays, 8), chunks.dtype)
        out0 = jnp.zeros_like(chunks)
        (_, out), _ = jax.lax.scan(macro_step, (buf0, out0),
                                   jnp.arange(T))
        if shard_chunks:
            return out
        # only device D-1 wrote real outputs; sum-reduce across the axis
        return jax.lax.psum(out, axis)

    chunk_spec = P(axis, None, None) if shard_chunks else P()
    if quantized:
        # int8 surface: the (n_seg, K+1, C) scales table follows
        # seg_planes, sharded over the same segment axis
        mapped = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(chunk_spec, P(axis, None, None),
                      P(axis, None, None), P(), P(), P()),
            out_specs=chunk_spec,
            check_vma=False,
        )
        return jax.jit(mapped)

    def local_float(chunks, seg_local, origin_ab, inv_ab, dp):
        return local_fn(chunks, seg_local, None, origin_ab, inv_ab, dp)

    mapped = jax.shard_map(
        local_float, mesh=mesh,
        in_specs=(chunk_spec, P(axis, None, None), P(), P(), P()),
        out_specs=chunk_spec,
        check_vma=False,
    )
    return jax.jit(mapped)
