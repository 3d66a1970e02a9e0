"""Device-mesh distribution: ray data-parallelism + grid sharding.

TPU-native replacement for every distribution strategy in the reference
(SURVEY.md section 2.5):

* mpi4py rank-parallel ray bundles with histogram comm.reduce
  (example_ParallelisationGuide.py:33-141, pvti_trace_mpi.py:144-170)
  -> rays sharded over a 1-D ``rays`` mesh axis; the detector scatter-add
  partitions automatically under jit and the reduction is an in-graph psum
  over ICI instead of pickled MPI messages.
* multiprocessing BaseManager shared-domain pools
  (example_ParallelisationGuide.py:144-239) -> subsumed: the field is
  replicated (or sharded) across devices by GSPMD.
* host-memory "auto-batching" slab decomposition (domain.py:137-227)
  -> ``grid`` mesh axis: the channel grid is sharded along x with a one-row
  halo exchanged via ppermute, each shard interpolates the rays inside its
  ownership interval, and a psum over the grid axis assembles full RHS
  values. This is the TP analogue for 1024^3+ fields that exceed one HBM.

Meshes are ordinary ``jax.sharding.Mesh`` objects, so everything here runs
identically on N real TPU chips or N fake CPU host devices
(--xla_force_host_platform_device_count), which is how tests/test_parallel.py
exercises it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from synthpy_tpu.fields.domain import ChannelLayout
from synthpy_tpu.ops.interp import trilinear


def ray_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    """1-D mesh over (up to) all visible devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    # Auto axis type = classic GSPMD propagation: jax 0.9's explicit
    # sharding-in-types cannot infer the output spec of the tracer's gathers.
    return jax.make_mesh((len(devs),), (axis,), devices=devs,
                         axis_types=(AxisType.Auto,))


def mesh_from_spec(spec: str, grid_axis: Optional[str] = None,
                   pp_axis: Optional[str] = None):
    """Parse an ``'axis=N[,axis=N]'`` mesh spec (the CLI surface) into a
    Mesh plus the resolved grid axis name.

    ``'rays=8'`` -> 1-D ray-DP mesh; ``'grid=4,rays=2'`` -> 2-D field x
    ray mesh; ``'seg=8'`` with ``pp_axis='seg'`` -> depth-pipelined
    mesh. The grid axis defaults to ``'grid'`` when the spec names one.
    Axis types are Auto (GSPMD propagation — see :func:`ray_mesh`).
    Raises ValueError on malformed specs, unknown grid/pp axes, a
    missing rays/grid/pp axis, or too few visible devices.
    """
    try:
        parsed = {}
        for part in spec.split(","):
            name, _, size = part.partition("=")
            parsed[name.strip()] = int(size)
    except ValueError:
        raise ValueError(f"bad mesh spec {spec!r}; expected "
                         "'axis=N[,axis=N]' e.g. 'grid=4,rays=2'")
    grid_axis = grid_axis or ("grid" if "grid" in parsed else None)
    if grid_axis is not None and grid_axis not in parsed:
        raise ValueError(f"grid axis {grid_axis!r} not in mesh spec "
                         f"{spec!r}")
    if pp_axis is not None and pp_axis not in parsed:
        raise ValueError(f"pp axis {pp_axis!r} not in mesh spec {spec!r}")
    if "rays" not in parsed and grid_axis is None and pp_axis is None:
        raise ValueError("mesh spec needs a 'rays' axis and/or a grid "
                         "axis / pp axis")
    n_want = 1
    for s in parsed.values():
        n_want *= s
    if n_want > len(jax.devices()):
        raise ValueError(f"mesh spec {spec!r} wants {n_want} devices; "
                         f"jax sees {len(jax.devices())}")
    mesh = jax.make_mesh(tuple(parsed.values()), tuple(parsed.keys()),
                         axis_types=(AxisType.Auto,) * len(parsed))
    return mesh, grid_axis


def grid_ray_mesh(n_grid: int, n_rays: Optional[int] = None) -> Mesh:
    """2-D mesh: ``grid`` axis shards the field, ``rays`` axis the bundle."""
    devs = jax.devices()
    if n_rays is None:
        n_rays = len(devs) // n_grid
    return jax.make_mesh((n_grid, n_rays), ("grid", "rays"),
                         devices=devs[: n_grid * n_rays],
                         axis_types=(AxisType.Auto, AxisType.Auto))


def shard_rays(s_rows: jnp.ndarray, mesh: Mesh,
               axis: str = "rays") -> jnp.ndarray:
    """Place (Np, 9) ray rows with rows split across the mesh.

    Np is truncated to a multiple of the axis size, like the reference's
    CPU sharding path (propagator.py:504-505).
    """
    n = mesh.shape[axis]
    Np = (s_rows.shape[0] // n) * n
    assert Np > 0, f"not enough rays to shard over {n} devices"
    spec = P(axis, *([None] * (s_rows.ndim - 1)))
    return jax.device_put(s_rows[:Np], NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Replicate an array on every device of the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# Grid-sharded tracing (shard_map + halo exchange + psum)
# ---------------------------------------------------------------------------

def _rhs_gridsharded(s, channels_local, origin, inv_spacing,
                     layout: ChannelLayout, atten_sign: float,
                     grid_axis: str, nx_global: int):
    """RHS where ``channels_local`` is this device's x-slab (+1 halo row).

    Each shard claims queries whose global fractional x-index falls in its
    half-open ownership interval [i*nloc, (i+1)*nloc) (the last shard is
    closed at the global boundary); claimed queries interpolate locally
    using the halo row, unclaimed ones contribute zero, and a psum over the
    grid axis assembles the full value.
    """
    idx = jax.lax.axis_index(grid_axis)
    n_shards = jax.lax.axis_size(grid_axis)
    nloc = channels_local.shape[0] - 1  # minus halo row

    pos = s[:, 0:3]
    tx = (pos[:, 0] - origin[0]) * inv_spacing[0]
    lo = idx * nloc
    owned = (tx >= lo) & ((tx < lo + nloc) | ((idx == n_shards - 1)
                                              & (tx <= nx_global - 1)))

    local_origin = origin.at[0].add(lo / inv_spacing[0])
    vals = trilinear(channels_local, pos, local_origin, inv_spacing)
    vals = jnp.where(owned[:, None], vals, 0.0)
    vals = jax.lax.psum(vals, grid_axis)

    # re-assemble the 9-component derivative from the summed channel values
    v = s[:, 3:6]
    acc = vals[:, 0:3]
    N = s.shape[0]
    zeros = jnp.zeros((N, 1), s.dtype)
    d_amp = (atten_sign * vals[:, layout.kappa_index:layout.kappa_index + 1]
             * s[:, 6:7]) if layout.inv_brems else zeros
    d_phase = (vals[:, layout.phase_index:layout.phase_index + 1]
               if layout.phaseshift else zeros)
    if layout.B_on:
        W = vals[:, layout.faraday_index:layout.faraday_index + 3]
        d_pol = jnp.sum(W * v, axis=1, keepdims=True)
    else:
        d_pol = zeros
    return jnp.concatenate([v, acc, d_amp, d_phase, d_pol], axis=1)


def make_gridsharded_tracer(mesh: Mesh, layout: ChannelLayout, n_steps: int,
                            nx_global: int, atten_sign: float = -1.0,
                            grid_axis: str = "grid", ray_axis: str = "rays"):
    """Build a jitted tracer with the field sharded along x over
    ``grid_axis`` and rays sharded over ``ray_axis``.

    The returned function has signature
    ``f(s_rows, channels, origin, inv_spacing, dt) -> s_rows_final`` where
    ``channels`` is the full (nx, ny, nz, C) array (GSPMD splits it).
    """
    n_shards = mesh.shape[grid_axis]

    def local_fn(s_local, channels_shard, origin, inv_spacing, dt):
        # halo: receive the *first* row of the right neighbour
        first_row = channels_shard[0:1]
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        halo = jax.lax.ppermute(first_row, grid_axis, perm)
        channels_h = jnp.concatenate([channels_shard, halo], axis=0)

        def step(s, _):
            f = partial(_rhs_gridsharded, channels_local=channels_h,
                        origin=origin, inv_spacing=inv_spacing,
                        layout=layout, atten_sign=atten_sign,
                        grid_axis=grid_axis, nx_global=nx_global)
            k1 = f(s)
            k2 = f(s + 0.5 * dt * k1)
            k3 = f(s + 0.5 * dt * k2)
            k4 = f(s + dt * k3)
            return s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        out, _ = jax.lax.scan(step, s_local, None, length=n_steps)
        return out

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(ray_axis, None), P(grid_axis, None, None, None),
                  P(), P(), P()),
        out_specs=P(ray_axis, None),
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# Grid-sharded SEGMENTED march (the fast path, field split across chips)
# ---------------------------------------------------------------------------

def make_gridsharded_segment_tracer(mesh, layout: ChannelLayout, spack,
                                    *, grid_axis: str = "grid",
                                    ray_axis: Optional[str] = None,
                                    substeps: int = 1,
                                    atten_sign: float = -1.0,
                                    integrator: str = "rk4",
                                    unroll: int = 2,
                                    weights: str = "stage",
                                    table_na: Optional[int] = None):
    """Gather-hoisted segmented march with the FIELD sharded along the
    transverse a-axis over ``grid_axis`` — >HBM fields on the FAST path
    (the plain :func:`make_gridsharded_tracer` wraps the slow full-grid
    time tracer; PP shards by probing depth instead).

    Layout: device g owns a-rows [g*naloc, (g+1)*naloc) of every
    segment's (n_seg, na, nb, (K+1)C) corner table plus a one-row halo
    ppermuted from the right neighbour, so any ray whose frozen corner
    cell starts in the ownership interval interpolates entirely locally.
    Each device marches every ray of its ray shard through each segment
    via ``march_segment(a_offset=g*naloc)`` — all indices, fractions and
    inside-masks stay in GLOBAL coordinates and only the gather is
    offset into the local table, so owned rays are BIT-identical to the
    single-device march. Unowned rays (gather-clipped garbage) are
    discarded by the ownership mask and one (N, 8) psum per segment
    selects the owner's result; ownership is frozen at segment start
    exactly like the corner cells. Compose with ``ray_axis`` on a 2-D
    mesh for speed; the grid axis buys field capacity (1/G per device).

    The returned function has signature
    ``f(u, seg_tables, origin_ab, inv_ab, dp) -> uf`` with ``u`` the
    (N, 8) permuted ray state and ``seg_tables`` the
    (n_seg, na, nb, (K+1)C) reshape of ``spack.seg_planes`` (GSPMD
    shards it over ``grid_axis``).
    """
    from synthpy_tpu.tracer.zscan import march_segment, _plane_blocks

    # int8/int4 packs compose for free: scales are per-(segment, plane,
    # channel) — cell-independent — so each shard dequantises its local
    # table rows with the replicated scale row (closure constant)
    scales = getattr(spack, "scales", None)
    qbits = getattr(spack, "qbits", None)

    G = mesh.shape[grid_axis]
    na, nb = spack.shape_ab
    # Non-divisible transverse dims are padded with zero a-rows by the
    # caller (pipeline.run does this) to table_na = ceil(na/G)*G — EXACT:
    # the mask/clip bound stays at the REAL na (march_segment's
    # inside-mask and corner clip use shape_ab), so no ray ever owns or
    # interpolates a pad row, and halo rows consumed by owned cells
    # (ia0 <= na-2, rows <= na-1) are always real.
    if table_na is None:
        table_na = na
    assert table_na % G == 0, (
        f"transverse a-dim {table_na} must divide over the {G}-way "
        f"'{grid_axis}' axis (pad the segment tables with zero a-rows "
        f"to a multiple — pipeline.run(grid_axis=) does this "
        f"automatically)")
    assert table_na >= na, f"table_na {table_na} < shape_ab a-dim {na}"
    naloc = table_na // G
    K = spack.K
    cols = spack.seg_planes.shape[-1]
    C = cols // _plane_blocks(K, qbits)
    n_seg = spack.seg_planes.shape[0]

    def local_fn(u, segs_local, origin_ab, inv_ab, dp):
        g = jax.lax.axis_index(grid_axis)
        # halo: append the right neighbour's first a-row
        first = segs_local[:, :1]
        perm = [(i, (i - 1) % G) for i in range(G)]
        halo = jax.lax.ppermute(first, grid_axis, perm)
        segs_h = jnp.concatenate([segs_local, halo], axis=1)
        segs_flat = segs_h.reshape(n_seg, (naloc + 1) * nb, cols)
        lo = (g * naloc).astype(jnp.int32)

        def segment(uc, s):
            seg = jax.lax.dynamic_slice_in_dim(segs_flat, s, 1, axis=0)[0]
            sc = (None if scales is None else
                  jax.lax.dynamic_slice_in_dim(scales, s, 1, axis=0)[0])
            # ownership from the segment-start frozen corner cell (the
            # same clip as march_segment's, so every ray — including
            # off-grid drifters, clipped to the edge rows — has exactly
            # one owner)
            ta = (uc[:, 0] - origin_ab[0]) * inv_ab[0]
            ia0 = jnp.clip(jnp.floor(ta).astype(jnp.int32), 0, na - 2)
            owned = (ia0 // naloc) == g
            out = march_segment(
                uc, seg, origin_ab, inv_ab, dp,
                shape_ab=(na, nb), layout=layout, K=K, C=C,
                substeps=substeps, atten_sign=atten_sign,
                integrator=integrator, unroll=unroll, a_offset=lo,
                weights=weights, scales=sc, qbits=qbits)
            out = jnp.where(owned[:, None], out, 0.0)
            return jax.lax.psum(out, grid_axis), None

        uf, _ = jax.lax.scan(segment, u, jnp.arange(n_seg))
        return uf

    u_spec = P(ray_axis, None) if ray_axis else P()
    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(u_spec, P(None, grid_axis, None, None), P(), P(), P()),
        out_specs=u_spec,
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# Sharded detector reduction
# ---------------------------------------------------------------------------

def sharded_histogram(mesh: Mesh, bins, range_, ray_axis: str = "rays"):
    """Build a jitted histogrammer over rays sharded on ``ray_axis``:
    per-shard partial scatter-add + psum (the reference's MPI
    comm.reduce(H, SUM), pvti_trace_mpi.py:169, as one XLA collective)."""
    from synthpy_tpu.ops.histogram import histogram2d

    def local_fn(x, y, w):
        H, _, _ = histogram2d(x, y, bins, range_, weights=w)
        return jax.lax.psum(H, ray_axis)

    mapped = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(P(ray_axis), P(ray_axis), P(ray_axis)),
                           out_specs=P(),
                           check_vma=False)
    return jax.jit(mapped)
