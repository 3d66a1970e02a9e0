"""Differentiable diagnostics: jax.grad through field -> trace -> image.

A capability the reference architecture cannot offer: its trace runs
through scipy.solve_ivp / diffrax-with-NaN-filtering and bins with
histogram2d (reference full_solver.py:376-403, diagnostics.py:323-353),
none of which propagate derivatives. Here the whole forward model —
electron density grid -> gradient pack -> segmented RK slab march ->
composed ABCD optics -> detector — is a chain of smooth jnp ops, so an
experimental image can be INVERTED for the density field (or its
parameters) with standard gradient descent.

Two pieces make the chain differentiable end-to-end:

- ``apply_stages_weighted``: the optics benches kill aperture-clipped
  rays by setting their coordinates to NaN (reference
  diagnostics.py:173-245), which poisons reverse-mode gradients. Here
  apertures/stops instead multiply a per-ray transmission weight in
  {0, 1}; positions stay finite and the weight (a constant factor with
  zero derivative) masks the deposit.
- ``cic_image``: histogram2d's floor-indexing has zero derivative with
  respect to ray positions. Cloud-in-cell deposition (the adjoint of
  bilinear interpolation, as in ops.deposit_cic) is piecewise-linear in
  position, giving the nonzero detector gradient the inverse problem
  needs.

Usage::

    render = make_renderer(domain, s0, bins=(64, 48))
    image = render(ne)                       # forward
    g = jax.grad(lambda n: loss(render(n)))(ne)   # reverse

See examples/inverse_shadowgraphy.py for a full parameter-recovery run.
"""

from __future__ import annotations

import copy
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu.fields.domain import (ScalarDomain, build_pack, layout_of)
from synthpy_tpu.optics.compose import (BENCHES, NEEDS_JONES,
                                         analyser_weight)
from synthpy_tpu.optics.rtm import m_to_mm
from synthpy_tpu.tracer.propagator import ray_to_Jonesvector
from synthpy_tpu.tracer.zscan import (make_segment_pack, make_zscan_pack,
                                      reassemble_state,
                                      segment_pack_metadata,
                                      trace_zscan_segments)

__all__ = ["apply_stages_weighted", "cic_image", "cic_intensity_image",
           "make_renderer", "make_multiview_renderers"]


def apply_stages_weighted(r: jnp.ndarray, stages: Sequence[Tuple],
                          E: jnp.ndarray | None = None,
                          wavelength: float | None = None):
    """Apply composed optics stages, tracking a transmission weight.

    Same matrices as optics.compose.apply_stages, but filter elements
    multiply a per-ray weight instead of NaN-killing coordinates, so the
    output rays stay differentiable. Returns (rays (4, N), weight (N,)),
    or (rays, E, weight) when a Jones vector ``E`` (2, N) is given —
    phase checkpoints then advance E by e^{ik·path} exactly like
    optics.compose.apply_stages (wavelength [m] required).
    """
    w = jnp.ones(r.shape[1], r.dtype)
    r_mark = r
    for st in stages:
        kind = st[0]
        if kind == "matrix":
            r = jnp.asarray(st[1], r.dtype) @ r
        elif kind == "mark":
            r_mark = r
        elif kind == "phase":
            if E is not None:
                k = 2.0 * jnp.pi / wavelength
                dxp = (r[0, :] - r_mark[0, :]) * 1e-3  # mm -> m
                dyp = (r[2, :] - r_mark[2, :]) * 1e-3
                # safe norm (double-where): d sqrt(x^2+y^2) is 0/0 at the
                # origin, so an undeflected ray (exactly zero transverse
                # path — e.g. the ne=0 descent init) would poison the whole
                # reverse-mode gradient with NaN
                d2 = dxp**2 + dyp**2
                path = jnp.where(d2 > 0,
                                 jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
                E = E * jnp.exp(1.0j * k * path)
            r_mark = r
        elif kind == "aperture":
            w = w * (r[0, :] ** 2 + r[2, :] ** 2 <= st[1] ** 2)
        elif kind == "stop":
            w = w * (r[0, :] ** 2 + r[2, :] ** 2 > st[1] ** 2)
        elif kind == "rect":
            # match rtm.rect_aperture EXACTLY (the reference-parity
            # corner-clip: only rays outside BOTH half-widths die,
            # rtm.py:81-90) so the rendered forward model agrees with
            # the production pipeline it inverts against
            w = w * ~((r[0, :] ** 2 > st[1] ** 2)
                      & (r[2, :] ** 2 > st[2] ** 2))
        elif kind == "knife":
            # stage layout ("knife", offset, axis, direction), as consumed
            # by apply_stages -> rtm.knife_edge(r, st[1], st[2], st[3]);
            # knife_edge KILLS r > offset for direction > 0 (rtm.py:93-99)
            offset, axis, direction = st[1], st[2], st[3]
            row = 0 if axis == "x" else 2
            if direction > 0:
                w = w * (r[row, :] <= offset)
            else:
                w = w * (r[row, :] >= offset)
        else:
            raise ValueError(f"unknown stage {kind!r}")
    if E is not None:
        return r, E, w
    return r, w


def _cic_coords(x, y, bins, Lx, Ly):
    """Pixel-centre CIC coordinates: (ix, iy, fx, fy, finite-mask).

    True CIC at the edges: indices are NOT clipped — deposits whose
    target pixel falls outside [0, nx) x [0, ny) are dropped by the
    scatter, so a cloud half-off the detector deposits only its
    overlapping fraction (and dI/dposition stays nonzero in the edge
    band, unlike a clip-and-saturate scheme).
    """
    nx, ny = bins
    tx = (x + Lx / 2) * (nx / Lx) - 0.5
    ty = (y + Ly / 2) * (ny / Ly) - 0.5
    finite = jnp.isfinite(tx) & jnp.isfinite(ty)
    tx = jnp.where(finite, tx, -10.0)   # park NaNs safely off-detector
    ty = jnp.where(finite, ty, -10.0)
    ix = jnp.floor(tx).astype(jnp.int32)
    iy = jnp.floor(ty).astype(jnp.int32)
    return ix, iy, tx - ix, ty - iy, finite


def cic_image(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray,
              bins: Tuple[int, int], Lx: float, Ly: float) -> jnp.ndarray:
    """Differentiable detector: cloud-in-cell DENSITY deposition.

    Each ray deposits its weight onto the 4 surrounding pixel centres
    with bilinear fractions — piecewise-linear in (x, y), so reverse-mode
    gradients flow back to ray positions (unlike histogram2d). Detector
    spans [-Lx/2, Lx/2] x [-Ly/2, Ly/2] mm like ops.histogram2d.
    """
    nx, ny = bins
    ix, iy, fx, fy, finite = _cic_coords(x, y, bins, Lx, Ly)
    wv = jnp.where(finite, w, 0.0)
    H = jnp.zeros((nx, ny), x.dtype)
    for ddx, wx in ((0, 1.0 - fx), (1, fx)):
        for ddy, wy in ((0, 1.0 - fy), (1, fy)):
            # mode="drop" only drops indices >= n; NEGATIVE indices wrap
            # (numpy semantics), so mask the low side explicitly
            ok = (ix + ddx >= 0) & (iy + ddy >= 0)
            H = H.at[ix + ddx, iy + ddy].add(
                jnp.where(ok, wv * wx * wy, 0.0), mode="drop")
    return H.T   # (ny, nx) image convention, matching ops.histogram2d


def cic_intensity_image(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray,
                        E: jnp.ndarray, bins: Tuple[int, int],
                        Lx: float, Ly: float) -> jnp.ndarray:
    """Differentiable COHERENT detector: |sum w·E|^2 per pixel via CIC.

    Per-polarisation complex field amplitudes are deposited cloud-in-cell
    (real/imag channels separately — complex scatter-add is unimplemented
    on TPU, see ops.histogram), then the intensity
    I = |sum Ex|^2 + |sum Ey|^2 is formed per pixel: the physically
    standard convention (ops.complex_histogram(convention="intensity")),
    smooth in ray positions AND phases, so interferograms can be
    inverted for the phase object that produced them.
    """
    nx, ny = bins
    ix, iy, fx, fy, finite = _cic_coords(x, y, bins, Lx, Ly)
    wv = jnp.where(finite, w, 0.0)
    chans = jnp.stack([jnp.real(E[0]), jnp.imag(E[0]),
                       jnp.real(E[1]), jnp.imag(E[1])], axis=-1)
    chans = chans * wv[:, None]
    acc = jnp.zeros((nx, ny, 4), chans.dtype)
    for ddx, wx in ((0, 1.0 - fx), (1, fx)):
        for ddy, wy in ((0, 1.0 - fy), (1, fy)):
            ok = ((ix + ddx >= 0) & (iy + ddy >= 0))[:, None]
            acc = acc.at[ix + ddx, iy + ddy].add(
                jnp.where(ok, chans * (wx * wy)[:, None], 0.0),
                mode="drop")
    I = (acc[..., 0] ** 2 + acc[..., 1] ** 2
         + acc[..., 2] ** 2 + acc[..., 3] ** 2)
    return I.T   # (ny, nx) image convention


def make_renderer(
    domain: ScalarDomain,
    s0: jnp.ndarray,
    *,
    diagnostic: str = "shadowgraphy",
    bins: Tuple[int, int] = (64, 48),
    lwl: float = 1064e-9,
    K: int = 16,
    L: float = 400.0,
    R: float = 25.0,
    Lx: float = 18.0,
    Ly: float = 13.5,
    focal_plane: float = 0.0,
    probing_depth: float | None = None,
    n_fringes: float = 10.0,
    deg: float = 20.0,
    pol_beta_deg: float = 85.0,
    remat: bool = True,
    pack_dtype=None,
    bench_kwargs: Optional[dict] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``render(ne) -> image``, differentiable with respect to ne.

    ``pack_dtype``: optional down-cast for the traced segment tables
    (e.g. ``jnp.bfloat16`` — halves the largest live buffers of the
    reverse pass; interpolation math stays f32). At 512^3 the f32 chain
    needs ~41 GB of HBM for the backward pass while the bf16 chain fits
    one v5e chip (examples/inverse_volume_joint.py at dim=512).

    ``domain`` provides the static geometry (grid coordinates, probing
    direction); the returned closure re-derives the gradient pack from
    the ``ne`` argument on every call so jax.grad sees the full chain.

    Incoherent benches (shadowgraphy/schlieren/refractometry) deposit
    transmission weights (cic_image); coherent benches (interferometry /
    refractometry_coherent) require ``domain.phaseshift=True``, carry the
    Jones vector through the phase-checkpointed stages, add the tilted
    reference beam for interferometry (``n_fringes``/``deg``, reference
    diagnostics.py:559-581) and deposit |sum E|^2 (cic_intensity_image) —
    an interferogram you can differentiate for the phase object.

    ``remat`` (default True) checkpoints the march at segment
    granularity: reverse-mode memory scales with n_seg instead of the
    slab count (one forward recompute per segment in the backward pass),
    which is what lets 512^3-class inverse problems fit in HBM.

    ``diagnostic`` may be a tuple of bench names: the bundle is traced
    ONCE and every bench image is rendered from the same differentiable
    exit state — ``render(ne)`` then returns a tuple of images in the
    given order, the forward model for JOINT multi-diagnostic inversion
    (one loss over several synthetic detectors constraining the same
    field).
    """
    multi = not isinstance(diagnostic, str)
    names = tuple(diagnostic) if multi else (diagnostic,)
    # "phase_map" is the model-side counterpart of the experimental
    # demodulate-and-unwrap workflow (analysis.fringes.phase_difference +
    # unwrap_2d): the transmission-weighted mean PLASMA phase per
    # detector pixel, imaged through the interferometry lens train. It
    # needs the traced phase but no reference beam, and because phase is
    # LINEAR in ne it gives inverse problems a smooth absolute-scale
    # constraint where a raw fringe MSE is wrap-trapped (the fringe
    # image decoheres once shape error exceeds ~2pi/phi_total).
    needs_phase = [n == "phase_map" or BENCHES[n][1] for n in names]
    any_coherent = any(BENCHES[n][1] or n in NEEDS_JONES
                       for n in names if n != "phase_map")
    if any(needs_phase) and not domain.phaseshift:
        raise ValueError(f"{names} includes a phase-carrying bench: "
                         "requires domain.phaseshift=True (the trace "
                         "must accumulate refractive phase)")
    geom = copy.copy(domain)
    layout = layout_of(domain)
    depth = domain.extent if probing_depth is None else probing_depth
    pd = domain.probing_direction
    p_ax = {"x": 0, "y": 1, "z": 2}[pd]
    a_ax, b_ax = [a for a in range(3) if a != p_ax]
    bk = bench_kwargs or {}
    all_stages = [
        BENCHES["interferometry" if n == "phase_map" else n][0](
            L=L, R=R, focal_plane=focal_plane, **bk.get(n, {}))
        for n in names]
    s = jnp.asarray(s0)
    u0 = jnp.stack([s[a_ax], s[b_ax], s[3 + a_ax], s[3 + b_ax],
                    s[3 + p_ax], s[6], s[7], s[8]], axis=1)

    # static segment geometry straight from the domain coordinates (an
    # eager throwaway table build OOMs at 512^3); the per-call pack
    # build below is wrapped in jax.checkpoint so the reverse pass
    # recomputes the (cheap) gradient/phase channel chain instead of
    # storing its ~pack-sized intermediates + cotangents — together with
    # march_segment(remat=True)'s slab-level checkpoints this brings a
    # 512^3 inversion's backward pass from 41 GB into one chip's HBM.
    sp0 = segment_pack_metadata(geom, lwl, K=K)
    n_seg0 = -(-sp0.n_slabs // K)

    @jax.checkpoint
    def _seg_planes(ne):
        g2 = copy.copy(geom)
        g2.ne = ne
        pack = build_pack(g2, lwl)
        zp = make_zscan_pack(pack, layout, pd, dtype=pack_dtype)
        return make_segment_pack(zp, K=K).seg_planes

    def render(ne: jnp.ndarray):
        """Differentiable forward model: ne volume -> detector image(s)."""
        sp = sp0._replace(seg_planes=_seg_planes(ne))
        uf = trace_zscan_segments(
            u0, sp.seg_planes, sp.origin_ab, sp.inv_spacing_ab,
            jnp.asarray(sp.dp, u0.dtype), shape_ab=sp.shape_ab,
            layout=layout, K=sp.K, n_seg=n_seg0,
            remat=remat)
        sf = reassemble_state(
            uf, sp.p0 + n_seg0 * sp.K * sp.dp, pd)
        rf, Jf = ray_to_Jonesvector(sf, depth, probing_direction=pd,
                                    return_E=any_coherent)
        r_mm = m_to_mm(rf)
        images = []
        for name, stages in zip(names, all_stages):
            if name == "phase_map":
                # per-pixel transmission-weighted mean plasma phase:
                # deposit w*phi and w with the same CIC footprint and
                # divide where sampled (0 elsewhere). Smooth in ray
                # positions AND linear in the traced phase.
                phi = sf[7]
                r_out, w = apply_stages_weighted(r_mm, stages)
                num = cic_image(r_out[0, :], r_out[2, :], w * phi,
                                bins, Lx, Ly)
                den = cic_image(r_out[0, :], r_out[2, :], w, bins,
                                Lx, Ly)
                # regularised division, floor = 1e-3 of one ray's
                # weight: unsampled pixels go to 0 (num == 0 there)
                # and the backward jacobian stays bounded by
                # |phi|/floor. A tiny where-style eps is a NaN trap:
                # sliver-weight pixels (den ~ 1e-6 from one CIC
                # corner) make 1/den^2 jacobians overflow to inf and
                # inf * 0-cotangent = NaN poisons the whole gradient.
                images.append(num / (den + jnp.asarray(1e-3,
                                                       den.dtype)))
            elif BENCHES[name][1]:
                from synthpy_tpu.optics.compose import interfere_ref_beam

                E = Jf
                if name == "interferometry":
                    E = interfere_ref_beam(r_mm, E, n_fringes, deg)
                r_out, E_out, w = apply_stages_weighted(r_mm, stages, E=E,
                                                        wavelength=lwl)
                images.append(cic_intensity_image(
                    r_out[0, :], r_out[2, :], w, E_out, bins, Lx, Ly))
            elif name in NEEDS_JONES:
                # Faraday polarimetry: the analyser weight
                # (optics.compose.analyser_weight) folds into the
                # aperture-transmission weight. pol depends on ne through
                # Verdet*ne*B, so polarograms constrain ne given a known B
                # (Faraday inversion).
                wp = analyser_weight(Jf, pol_beta_deg, r_mm.dtype)
                r_out, w = apply_stages_weighted(r_mm, stages)
                images.append(cic_image(r_out[0, :], r_out[2, :], w * wp,
                                        bins, Lx, Ly))
            else:
                r_out, w = apply_stages_weighted(r_mm, stages)
                images.append(cic_image(r_out[0, :], r_out[2, :], w, bins,
                                        Lx, Ly))
        return tuple(images) if multi else images[0]

    return render


def make_multiview_renderers(
    domain: ScalarDomain,
    beams: dict,
    **renderer_kwargs,
) -> dict:
    """Renderers for several probing directions of the SAME volume.

    The tomographic forward model: each entry of ``beams`` maps a
    probing direction ('x'/'y'/'z') to its ray bundle s0 (built with
    :func:`tracer.init_beam(probing_direction=...)`); the returned dict
    maps each direction to a :func:`make_renderer` closure over a copy
    of ``domain`` probing along that axis. All closures consume the
    same ``ne`` argument, so a joint loss over every view's images is
    differentiable with respect to one shared volume.

    Why this matters: a single parallel view's data is (to first order)
    a projection along its probing axis — a Fourier mode with a nonzero
    wavenumber component along that axis integrates to zero, so
    single-view inversion recovers only the beam-integrated 2.5-D field
    (measured: rel_l2_full 0.87-0.89 at 512^3 while rel_l2_beam reaches
    0.385, scratch/results_inverse_joint_r3.json). Orthogonal views see
    complementary mode sets; jointly fitted they localise structure in
    all three coordinates. The reference has no differentiable trace at
    all (its solve_ivp/diffrax + histogram2d chain propagates no
    derivatives; reference full_solver.py:376-403, diagnostics.py:
    323-353), let alone a multi-view inversion surface.

    ``renderer_kwargs`` are forwarded to every :func:`make_renderer`
    call (same benches, bins, optics for each arm — the usual
    experimental layout; build arms individually for per-view optics).
    """
    renders = {}
    for view, s0 in beams.items():
        g = copy.copy(domain)
        g.probing_direction = view
        renders[view] = make_renderer(g, s0, **renderer_kwargs)
    return renders
