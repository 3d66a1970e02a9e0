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
at M/(M+D-1) efficiency. Each device holds only its segment shard
(field memory scales 1/D); in this in-graph version the INPUT ray chunks
are replicated for injection at device 0 (fine for the chunk sizes used
per call — feed successive calls for larger campaigns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from synthpy_tpu.fields.domain import ChannelLayout
from synthpy_tpu.tracer.zscan import SegmentPack, _seg_deriv


def make_pipelined_segment_tracer(
    mesh: Mesh,
    layout: ChannelLayout,
    spack: SegmentPack,
    n_chunks: int,
    substeps: int = 1,
    atten_sign: float = -1.0,
    axis: str = "seg",
    integrator: str = "rk4",
):
    """Build a jitted PP tracer over ``axis`` of ``mesh``.

    The returned function has signature
    ``f(chunks, seg_planes, origin_ab, inv_ab, dp) -> chunks_out`` where
    ``chunks`` is (n_chunks, chunk_rays, 8) permuted ray state and
    ``seg_planes`` the full (n_seg, nab, (K+1)C) table (GSPMD shards it
    over ``axis``). ``integrator``: "rk4" (parity) or "rk2" (midpoint
    production mode, same semantics as trace_zscan_segments; requires
    substeps=1) — keeps the multi-chip path at fast-mode parity with the
    single-chip tracer.
    """
    if integrator not in ("rk4", "rk2"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if integrator == "rk2" and substeps != 1:
        raise ValueError("integrator='rk2' requires substeps=1")
    D = mesh.shape[axis]
    n_seg = spack.seg_planes.shape[0]
    assert n_seg % D == 0, f"n_seg {n_seg} must divide over {D} devices"
    segs_local = n_seg // D
    K = spack.K
    C = spack.seg_planes.shape[-1] // (K + 1)
    na, nb = spack.shape_ab
    shape_ab = spack.shape_ab

    def local_fn(chunks, seg_local, origin_ab, inv_ab, dp):
        d = jax.lax.axis_index(axis)
        h = dp / substeps
        M, chunk_rays, _ = chunks.shape
        T = M + D - 1

        def march(u):
            """Process one ray chunk through this device's segments."""
            def segment(uc, s):
                seg = jax.lax.dynamic_slice_in_dim(seg_local, s, 1,
                                                   axis=0)[0]
                ta = (uc[:, 0] - origin_ab[0]) * inv_ab[0]
                tb = (uc[:, 1] - origin_ab[1]) * inv_ab[1]
                ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
                ib0 = jnp.clip(jnp.floor(tb).astype(jnp.int32), 0, nb - 2)
                base = ia0 * nb + ib0
                corners = tuple(
                    jnp.take(seg, base + off, axis=0, mode="clip"
                             ).reshape(-1, K + 1, C)
                    for off in (0, 1, nb, nb + 1))
                ia0f = ia0.astype(uc.dtype)
                ib0f = ib0.astype(uc.dtype)

                def slab(uc, k):
                    def stage(uu, f):
                        return _seg_deriv(uu, corners, k, f, ia0f, ib0f,
                                          origin_ab, inv_ab, shape_ab,
                                          layout, atten_sign, C)

                    def substep(uc, j):
                        f0 = j / substeps
                        fh = (j + 0.5) / substeps
                        f1 = (j + 1.0) / substeps
                        k1 = stage(uc, f0)
                        k2 = stage(uc + 0.5 * h * k1, fh)
                        k3 = stage(uc + 0.5 * h * k2, fh)
                        k4 = stage(uc + h * k3, f1)
                        return uc + (h / 6.0) * (k1 + 2 * k2 + 2 * k3
                                                 + k4), None

                    if substeps == 1:
                        if integrator == "rk2":
                            k1 = stage(uc, 0.0)
                            k2 = stage(uc + 0.5 * h * k1, 0.5)
                            return uc + h * k2, None
                        uc, _ = substep(uc, 0.0)
                    else:
                        uc, _ = jax.lax.scan(
                            substep, uc,
                            jnp.arange(substeps, dtype=uc.dtype))
                    return uc, None

                uc, _ = jax.lax.scan(slab, uc, jnp.arange(K))
                return uc, None

            u, _ = jax.lax.scan(segment, u, jnp.arange(segs_local))
            return u

        perm = [(i, (i + 1) % D) for i in range(D)]

        def macro_step(carry, t):
            buf, out = carry
            # device 0 injects chunk t (if it exists)
            inject = jnp.where(t < M, t, 0)
            fresh = jax.lax.dynamic_slice_in_dim(chunks, inject, 1,
                                                 axis=0)[0]
            buf = jnp.where(jnp.logical_and(d == 0, t < M), fresh, buf)
            # active devices process their resident chunk
            c_idx = t - d
            active = (c_idx >= 0) & (c_idx < M)
            processed = march(buf)
            buf = jnp.where(active, processed, buf)
            # the last device deposits finished chunks
            slot = jnp.where(active, c_idx, 0)
            contrib = jnp.where(jnp.logical_and(d == D - 1, active),
                                buf, 0.0)
            out = jax.lax.dynamic_update_slice_in_dim(
                out,
                (jax.lax.dynamic_slice_in_dim(out, slot, 1, axis=0)[0]
                 + contrib)[None],
                slot, axis=0)
            # hand the chunk to the next device
            buf = jax.lax.ppermute(buf, axis, perm)
            return (buf, out), None

        buf0 = jnp.zeros((chunk_rays, 8), chunks.dtype)
        out0 = jnp.zeros_like(chunks)
        (_, out), _ = jax.lax.scan(macro_step, (buf0, out0),
                                   jnp.arange(T))
        # only device D-1 wrote real outputs; sum-reduce across the axis
        return jax.lax.psum(out, axis)

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)
