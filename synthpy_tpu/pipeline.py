"""End-to-end fused pipelines: trace -> optics -> detector in one jit.

The flagship computation: a ray bundle traced through a plasma domain,
pushed through an optical bench, and binned into a detector image, all as
one XLA program with no host round-trips. The reference runs these stages
as separate Python phases with host transfers and (for MPI) pickled field
broadcasts between them (pvti_trace_mpi.py:144-170); here the whole thing
is a single compiled function that GSPMD shards over a ray mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu.fields.domain import (
    ChannelLayout,
    ScalarDomain,
    TracePack,
    build_pack,
    layout_of,
)
from synthpy_tpu.ops.histogram import complex_histogram, histogram2d
from synthpy_tpu.optics.diagnostics import (
    Interferometry,
    Refractometry,
    Schlieren,
    Shadowgraphy,
)
from synthpy_tpu.tracer.propagator import ray_to_Jonesvector, trace_rk4

DIAGNOSTICS = {
    "shadowgraphy": (Shadowgraphy, "two_lens_solve", False),
    "shadowgraphy_single": (Shadowgraphy, "single_lens_solve", False),
    "schlieren_df": (Schlieren, "DF_solve", False),
    "schlieren_lf": (Schlieren, "LF_solve", False),
    "refractometry": (Refractometry, "incoherent_solve", False),
    "refractometry_coherent": (Refractometry, "coherent_solve", True),
    "interferometry": (Interferometry, "two_lens_solve", True),
}


@partial(jax.jit, static_argnames=(
    "layout", "n_steps", "diagnostic", "probing_direction", "bins",
    "ray_chunk", "lwl", "L", "R", "Lx", "Ly", "focal_plane"))
def synth_image(
    s_rows: jnp.ndarray,
    channels: jnp.ndarray,
    origin: jnp.ndarray,
    inv_spacing: jnp.ndarray,
    dt: jnp.ndarray,
    probing_depth: jnp.ndarray,
    *,
    layout: ChannelLayout,
    n_steps: int,
    diagnostic: str = "shadowgraphy",
    probing_direction: str = "z",
    bins: Tuple[int, int] = (431, 321),  # pix/8 of a KAF-8300
    ray_chunk: Optional[int] = None,
    lwl: float = 1064e-9,
    L: float = 400.0,
    R: float = 25.0,
    Lx: float = 18.0,
    Ly: float = 13.5,
    focal_plane: float = 0.0,
) -> jnp.ndarray:
    """Trace (Np, 9) rays and synthesise a detector image, fully fused.

    Returns the (ny, nx) detector image H. For coherent diagnostics
    (interferometry, coherent refractometry) H is the complex-amplitude
    image; otherwise it is the ray-count histogram.
    """
    cls, method, coherent = DIAGNOSTICS[diagnostic]

    sf_rows = trace_rk4(s_rows, channels, origin, inv_spacing, dt,
                        layout=layout, n_steps=n_steps, ray_chunk=ray_chunk)
    rf, Jf = ray_to_Jonesvector(sf_rows.T, probing_depth,
                                probing_direction=probing_direction,
                                return_E=coherent)

    diag = cls(lwl, rf, Jf, focal_plane=focal_plane, L=L, R=R, Lx=Lx, Ly=Ly)
    getattr(diag, method)()

    if coherent:
        return complex_histogram(diag.rf[0, :], diag.rf[2, :],
                                 diag.Jf[0, :], diag.Jf[1, :],
                                 bins[0] + 1, bins[1] + 1, Lx, Ly)
    H, _, _ = histogram2d(diag.rf[0, :], diag.rf[2, :], bins,
                          ((-Lx / 2, Lx / 2), (-Ly / 2, Ly / 2)))
    return H


def run(
    domain: ScalarDomain,
    s0: jnp.ndarray,
    *,
    diagnostic: str = "shadowgraphy",
    lwl: float = 1064e-9,
    n_steps: Optional[int] = None,
    steps_per_cell: float = 1.0,
    probing_depth: Optional[float] = None,
    pack: Optional[TracePack] = None,
    bins: Tuple[int, int] = (431, 321),
    ray_chunk: Optional[int] = None,
    **bench_kwargs,
) -> jnp.ndarray:
    """Convenience wrapper: pack the domain and run the fused pipeline."""
    from synthpy_tpu.constants import C
    from synthpy_tpu.tracer.propagator import default_n_steps

    if pack is None:
        pack = build_pack(domain, lwl)
    if probing_depth is None:
        probing_depth = domain.extent
    if n_steps is None:
        n_steps = default_n_steps(domain, probing_depth, steps_per_cell)
    s_rows = jnp.asarray(s0).T
    dt = jnp.asarray(jnp.sqrt(8.0) * probing_depth / C / n_steps,
                     dtype=s_rows.dtype)
    return synth_image(
        s_rows, pack.channels, pack.origin, pack.inv_spacing, dt,
        jnp.asarray(probing_depth, s_rows.dtype),
        layout=layout_of(domain), n_steps=n_steps, diagnostic=diagnostic,
        probing_direction=domain.probing_direction, bins=bins,
        ray_chunk=ray_chunk, lwl=lwl, **bench_kwargs)
