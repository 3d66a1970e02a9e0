"""Adaptive Dormand-Prince 5(4) tracer — the validation integrator.

The reference validates its fixed-step production path against adaptive
integration (scipy solve_ivp RK45 serially, diffrax Tsit5 in parallel;
solver_comparisons.py:64-85). This module provides the same capability
on-device with no diffrax dependency: a Dormand-Prince 5(4) pair with a
PI step-size controller under lax.while_loop.

Semantics mirror solve_ivp on the flattened 9N system (the legacy serial
path, full_solver.py:376-403): ONE shared adaptive step for the whole
bundle, with the error norm taken over all rays. Per-ray adaptivity would
diverge warp-wise on TPU; a shared step keeps the computation dense and is
exactly what the oracle does too.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from synthpy_tpu.constants import C
from synthpy_tpu.fields.domain import (
    ChannelLayout,
    ScalarDomain,
    TracePack,
    build_pack,
    layout_of,
)
from synthpy_tpu.tracer.propagator import TraceResult, ray_to_Jonesvector
from synthpy_tpu.tracer.propagator import _rhs

# Dormand-Prince 5(4) Butcher tableau (the RK45 of scipy.solve_ivp)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
       187 / 2100, 1 / 40)


@partial(jax.jit, static_argnames=("layout", "max_steps", "atten_sign",
                                   "p_axis"))
def trace_rk45(
    s_rows: jnp.ndarray,
    channels: jnp.ndarray,
    origin: jnp.ndarray,
    inv_spacing: jnp.ndarray,
    t_end: jnp.ndarray,
    *,
    layout: ChannelLayout,
    rtol: float = 1e-6,
    atol: float = 1e-3,
    max_steps: int = 4096,
    atten_sign: float = -1.0,
    plane_amax: Optional[jnp.ndarray] = None,
    p_axis: Optional[int] = None,
):
    """Integrate (Np, 9) rays to t_end with shared adaptive DP5(4) steps.

    Steps are additionally capped at one probing-cell crossing (the
    reference's commented dtmax heuristic, propagator.py:556): on a
    piecewise-trilinear field the embedded error estimate cannot see kinks
    the stage points skip over, so an uncapped controller overstrides.
    The cap is relaxed from the field's own gradient bound: accumulated
    kink error over the whole trace is <= a_max * h * t_end / 2, so when
    the peak acceleration a_max is small the controller may stride many
    cells (vacuum integrates in O(1) steps) without exceeding the position
    tolerance; strong fields keep the half-cell cap.

    ``plane_amax`` (with static ``p_axis``) refines the cap to a LOCAL
    bound: a (n_p,) table of the peak acceleration per probing-axis
    plane. Each step looks up the max over only the planes the bundle
    can touch during that step, so a field with a localized strong
    feature (a filament, a shock) pays the tight kink cap only while the
    bundle crosses it and strides at the vacuum rate elsewhere — the
    per-segment a_max refinement of the round-2 ROADMAP. Omitted ->
    global a_max (identical caps everywhere).

    Returns:
        (s_final, n_accepted, n_rejected).
    """
    f = lambda s: _rhs(s, channels, origin, inv_spacing, layout, atten_sign)
    # half a cell per step: the embedded pair cannot detect errors from
    # interpolation kinks its stages jump over, so accuracy is governed by
    # this cap rather than rtol once rtol is small (z-scan, whose stages
    # align with the grid planes, is the high-accuracy path)
    cell = 1.0 / jnp.max(inv_spacing)
    cell_cap = 0.5 * cell / C
    # kink-error bound: channels[..., :3] ARE the acceleration components,
    # so a_max bounds |Delta a| across any kink. Position error over the
    # trace is <= a_max*h*T/2; velocity error <= a_max*h*N_kinks with
    # N_kinks ~ c*T/cell. Keeping both below the controller's own absolute
    # tolerances (atol * col_scale: 1e-3 m and C m/s) gives
    # h <= atol*min(2e-3, cell)/(a_max*T); scales with atol, so tightening
    # atol restores the flat half-cell cap.
    a_max = jnp.max(jnp.abs(channels[..., :3]))
    inf = jnp.asarray(jnp.inf, s_rows.dtype)

    def cap_of(a):
        return jnp.maximum(
            cell_cap,
            jnp.where(a > 0, atol * jnp.minimum(2e-3, cell) / (a * t_end),
                      inf))

    dt_max = cap_of(a_max)
    if plane_amax is not None:
        cell_p = 1.0 / inv_spacing[p_axis]
        plane_p = origin[p_axis] + jnp.arange(
            plane_amax.shape[0], dtype=s_rows.dtype) * cell_p

        def local_cap(s, dt):
            # planes reachable during this step: the bundle's probing-
            # coordinate span, widened by one cell of interpolation
            # support and the step's own flight c*dt
            p = s[:, p_axis]
            lo = jnp.min(p) - cell_p - C * dt
            hi = jnp.max(p) + cell_p + C * dt
            a_loc = jnp.max(jnp.where((plane_p >= lo) & (plane_p <= hi),
                                      plane_amax, 0.0))
            return cap_of(a_loc)
    else:
        def local_cap(s, dt):
            return dt_max

    # column scales for the mixed-unit state (positions ~ m, velocities
    # ~ c, amp/phase/pol O(1)): use per-column atol scaled by typical size
    col_scale = jnp.concatenate([
        jnp.full((3,), 1e-3), jnp.full((3,), C), jnp.full((3,), 1.0)])

    def cond(carry):
        t, dt, s, k1, n_acc, n_rej = carry
        return (t < t_end) & (n_acc + n_rej < max_steps)

    def body(carry):
        t, dt, s, k1, n_acc, n_rej = carry
        dt = jnp.minimum(jnp.minimum(dt, local_cap(s, dt)), t_end - t)

        ks = [k1]
        for i in range(1, 7):
            si = s
            for j, a in enumerate(_A[i]):
                si = si + dt * a * ks[j]
            ks.append(f(si))

        s5 = s
        for b, k in zip(_B5, ks):
            s5 = s5 + dt * b * k
        err = jnp.zeros_like(s)
        for b5, b4, k in zip(_B5, _B4, ks):
            err = err + dt * (b5 - b4) * k

        scale = atol * col_scale + rtol * jnp.maximum(jnp.abs(s),
                                                      jnp.abs(s5))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))

        accept = err_norm <= 1.0
        factor = jnp.clip(0.9 * err_norm ** (-0.2), 0.2, 5.0)
        dt_next = dt * jnp.where(jnp.isfinite(factor), factor, 0.2)

        t = jnp.where(accept, t + dt, t)
        s = jnp.where(accept, s5, s)
        # FSAL: k7 of an accepted step is k1 of the next
        k1 = jnp.where(accept, ks[6], k1)
        return (t, dt_next, s, k1,
                n_acc + accept.astype(jnp.int32),
                n_rej + (1 - accept.astype(jnp.int32)))

    t0 = jnp.zeros((), s_rows.dtype)
    dt0 = jnp.minimum(t_end / 100.0, dt_max)
    carry = (t0, dt0, s_rows, f(s_rows), jnp.int32(0), jnp.int32(0))
    t, dt, s, k1, n_acc, n_rej = jax.lax.while_loop(cond, body, carry)
    return s, n_acc, n_rej


def solve_adaptive(
    s0: jnp.ndarray,
    domain: ScalarDomain,
    probing_depth: Optional[float] = None,
    *,
    lwl: float = 1064e-9,
    return_E: bool = False,
    rtol: float = 1e-6,
    atol: float = 1e-3,
    max_steps: int = 4096,
    pack: Optional[TracePack] = None,
    local_cap: bool = True,
    return_steps: bool = False,
):
    """Adaptive-integrator drop-in for tracer.solve (validation path).

    ``local_cap`` (default on) uses the per-probing-plane peak
    acceleration to set the kink cap locally: a bundle crossing a
    localized strong feature steps finely only inside it (see
    trace_rk45's plane_amax). ``return_steps`` additionally returns the
    (accepted, rejected) step counts.
    """
    if probing_depth is None:
        probing_depth = domain.extent
    if pack is None:
        pack = build_pack(domain, lwl)
    layout = layout_of(domain)

    s_rows = jnp.asarray(s0).T
    t_end = jnp.asarray(jnp.sqrt(8.0) * probing_depth / C, s_rows.dtype)

    p_ax = domain.probe_axis
    if local_cap:
        other = tuple(i for i in range(3) if i != p_ax) + (3,)
        plane_amax = jnp.max(jnp.abs(pack.channels[..., :3]), axis=other)
    else:
        plane_amax = None

    start = time.perf_counter()
    sf_rows, n_acc, n_rej = trace_rk45(
        s_rows, pack.channels, pack.origin, pack.inv_spacing, t_end,
        layout=layout, rtol=rtol, atol=atol, max_steps=max_steps,
        plane_amax=plane_amax, p_axis=p_ax if local_cap else None)
    sf_rows.block_until_ready()
    duration = time.perf_counter() - start

    sf = sf_rows.T
    rf, Jf = ray_to_Jonesvector(sf, probing_depth,
                                probing_direction=domain.probing_direction,
                                return_E=return_E)
    res = TraceResult(rf, Jf, sf, duration)
    if return_steps:
        return res, (int(n_acc), int(n_rej))
    return res
