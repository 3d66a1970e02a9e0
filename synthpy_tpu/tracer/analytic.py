"""Pack-free z-scan march for closed-form (analytic) fields.

The gridded segment march is gather-bound: 4 random corner rows per ray
through the XLA gather engine is the measured floor that int8/int4 packs
attack by shrinking bytes (DESIGN.md step 6). For ANALYTIC fields — the
reference's own validation fixtures (null/slab/linear_cos/exponential_cos,
full_solver.py:130-167; lens/liner, minimal_solver.py:192-213) and any
user-supplied closed-form profile — there is a stronger move: evaluate the
field and its gradient IN CLOSED FORM at each RK stage. No pack build, no
HBM field table, no gathers at all; the march is pure VPU elementwise math
and the field is exact (grid-free: zero interpolation error, zero
plane-blend error along the probing axis).

Uses the same exact t->p reparameterisation, state permutation
(a, b, va, vb, vp, amp, phase, pol) and physics RHS (:func:`_cols_rhs`) as
the gridded march, so results are directly comparable and all diagnostics
downstream are shared.

Gradients come from ``jax.grad`` of the user's ne closure — exact to
machine precision for any differentiable jnp expression, with no
hand-derived formulas to get wrong. Closures must be ELEMENTWISE
(``ne(x, y, z)`` mapping same-shape arrays to a same-shape array), which
every physical profile is.

The analytic spec rides on ``ScalarDomain.analytic`` — the ``test_*``
constructors populate it automatically, and users can set it directly:

    dom = ScalarDomain(2 * ext, dim)
    dom.analytic = {"ne": lambda x, y, z: ne0 * jnp.exp(-(x**2+y**2)/LR**2)}

Optional keys "B" (``(x,y,z) -> (Bx, By, Bz)`` tuple), "Te", "Z" feed the
Faraday and inverse-bremsstrahlung channels when the corresponding domain
switches are on.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu import constants
from synthpy_tpu.fields.domain import ChannelLayout, ScalarDomain, layout_of
from synthpy_tpu.tracer.propagator import TraceResult, ray_to_Jonesvector
from synthpy_tpu.tracer.zscan import _AXIS_OF, _cols_rhs, reassemble_state


def _analytic_vals(cols, p, spec, layout: ChannelLayout, *, axes, bounds,
                   omega: float, lwl: float):
    """Channel values (N, C) at the stage position, closed form.

    Matches the gridded pack's channel contract exactly
    (fields.domain.TracePack): 3 acceleration components
    -c^2/2 * d(ne/nc)/dx_i permuted to (a, b, p) order, then optional
    kappa, omega*(n-1), Verdet*ne*B (also (a, b, p)-permuted). All
    channels are zeroed outside the domain box — the analytic analogue
    of the gridded fill_value=0.
    """
    a_ax, b_ax, p_ax = axes
    a, b = cols[0], cols[1]
    xyz = [None, None, None]
    xyz[a_ax], xyz[b_ax] = a, b
    xyz[p_ax] = jnp.broadcast_to(jnp.asarray(p, a.dtype), a.shape)
    x, y, z = xyz

    ne_fn = spec["ne"]
    nc = constants.critical_density(omega)
    # exact gradient of the ELEMENTWISE closure: grad of the sum has a
    # diagonal Jacobian, so each output is the per-element partial
    gx, gy, gz = jax.grad(
        lambda X, Y, Z: jnp.sum(ne_fn(X, Y, Z)), argnums=(0, 1, 2)
    )(x, y, z)
    scale = -0.5 * constants.C**2 / nc
    acc = (scale * gx, scale * gy, scale * gz)
    chans = [acc[a_ax], acc[b_ax], acc[p_ax]]

    ne_v = None
    if layout.inv_brems or layout.phaseshift or layout.B_on:
        ne_v = ne_fn(x, y, z)
    if layout.inv_brems:
        if "Te" not in spec or "Z" not in spec:
            raise ValueError("inv_brems needs 'Te' and 'Z' closures in "
                             "domain.analytic")
        chans.append(constants.kappa(ne_v, spec["Te"](x, y, z),
                                     spec["Z"](x, y, z), omega))
    if layout.phaseshift:
        chans.append(omega * (constants.n_refrac(ne_v, omega) - 1.0))
    if layout.B_on:
        if "B" not in spec:
            raise ValueError("B_on needs a 'B' closure in domain.analytic")
        Bv = spec["B"](x, y, z)
        verdet = constants.verdet_constant(lwl)
        W = [verdet * ne_v * jnp.broadcast_to(jnp.asarray(Bi, a.dtype),
                                              a.shape) for Bi in Bv]
        chans += [W[a_ax], W[b_ax], W[p_ax]]

    vals = jnp.stack([jnp.broadcast_to(c, a.shape) for c in chans], axis=1)
    (lo, hi) = bounds
    inside = ((x >= lo[0]) & (x <= hi[0]) & (y >= lo[1]) & (y <= hi[1])
              & (z >= lo[2]) & (z <= hi[2]))
    return jnp.where(inside[:, None], vals, 0.0)


@partial(jax.jit, static_argnames=("spec_id", "layout", "axes", "n_steps",
                                   "integrator", "atten_sign", "ray_chunk",
                                   "unroll"))
def _trace_analytic_jit(u, p0, h, lo, hi, *, spec_id, layout, axes, n_steps,
                        integrator, atten_sign, ray_chunk, unroll):
    spec = _SPECS[spec_id]
    bounds = (lo, hi)
    omega = _OMEGAS[spec_id]
    lwl = _LWLS[spec_id]

    def deriv(cc, pp):
        vals = _analytic_vals(cc, pp, spec, layout, axes=axes,
                              bounds=bounds, omega=omega, lwl=lwl)
        return _cols_rhs(cc, vals, layout, atten_sign)

    def run(u0):
        cols0 = tuple(u0[:, i] for i in range(8))

        def step(cols, i):
            p = p0 + i * h
            if integrator == "rk2":
                k1 = deriv(cols, p)
                mid = tuple(xv + 0.5 * h * kv for xv, kv in zip(cols, k1))
                k2 = deriv(mid, p + 0.5 * h)
                new = tuple(xv + h * kv for xv, kv in zip(cols, k2))
            else:  # rk4
                k1 = deriv(cols, p)
                k2 = deriv(tuple(xv + 0.5 * h * kv
                                 for xv, kv in zip(cols, k1)), p + 0.5 * h)
                k3 = deriv(tuple(xv + 0.5 * h * kv
                                 for xv, kv in zip(cols, k2)), p + 0.5 * h)
                k4 = deriv(tuple(xv + h * kv
                                 for xv, kv in zip(cols, k3)), p + h)
                new = tuple(xv + (h / 6.0) * (av + 2 * bv + 2 * cv + dv)
                            for xv, av, bv, cv, dv
                            in zip(cols, k1, k2, k3, k4))
            return new, None

        out, _ = jax.lax.scan(step, cols0,
                              jnp.arange(n_steps, dtype=u0.dtype),
                              unroll=unroll)
        return jnp.stack(out, axis=1)

    if ray_chunk is None or u.shape[0] <= ray_chunk:
        return run(u)
    N = u.shape[0]
    n_chunks = -(-N // ray_chunk)
    pad = n_chunks * ray_chunk - N
    blocks = jnp.pad(u, ((0, pad), (0, 0))).reshape(n_chunks, ray_chunk, 8)
    out = jax.lax.map(run, blocks)
    return out.reshape(n_chunks * ray_chunk, 8)[:N]


# Closures are not hashable jit statics in general (two lambdas with the
# same body differ), so the jitted tracer keys on a registry id. The
# registry is tiny (one entry per distinct (spec, omega, lwl) used this
# process) and lets XLA cache compilations across repeated solves.
_SPECS: dict = {}
_OMEGAS: dict = {}
_LWLS: dict = {}


def _register_spec(spec: dict, omega: float, lwl: float):
    key = (tuple(sorted((k, id(v)) for k, v in spec.items())),
           float(omega), float(lwl))
    if key not in _SPECS:
        _SPECS[key] = spec
        _OMEGAS[key] = float(omega)
        _LWLS[key] = float(lwl)
    return key


def trace_zscan_analytic(
    u: jnp.ndarray,
    spec: dict,
    layout: ChannelLayout,
    *,
    axes: Tuple[int, int, int],
    bounds,
    omega: float,
    lwl: float,
    p0: float,
    h: float,
    n_steps: int,
    integrator: str = "rk2",
    atten_sign: float = -1.0,
    ray_chunk: Optional[int] = None,
    unroll: int = 2,
) -> jnp.ndarray:
    """March (N, 8) permuted rays through a closed-form field.

    ``axes`` = (a_ax, b_ax, p_ax); ``bounds`` = (lo, hi) arrays of the
    domain box corners (channels are zero outside, matching the gridded
    fill-0). ``integrator`` is "rk2" (midpoint — with exact stage-point
    field evaluation its O(h^3) local error has no interpolation floor
    under it, unlike the gridded march) or "rk4".
    """
    if integrator not in ("rk2", "rk4"):
        raise ValueError(f"unknown integrator {integrator!r} "
                         "(analytic march: rk2 | rk4)")
    sid = _register_spec(spec, omega, lwl)
    lo, hi = bounds
    return _trace_analytic_jit(
        u, jnp.asarray(p0, u.dtype), jnp.asarray(h, u.dtype),
        jnp.asarray(lo, u.dtype), jnp.asarray(hi, u.dtype),
        spec_id=sid, layout=layout, axes=axes, n_steps=int(n_steps),
        integrator=integrator, atten_sign=atten_sign, ray_chunk=ray_chunk,
        unroll=unroll)


def solve_zscan_analytic(
    s0: jnp.ndarray,
    domain: ScalarDomain,
    probing_depth: Optional[float] = None,
    *,
    lwl: float = 1064e-9,
    n_steps: Optional[int] = None,
    integrator: str = "rk2",
    return_E: bool = False,
    atten_sign: float = -1.0,
    ray_chunk: Optional[int] = None,
) -> TraceResult:
    """Drop-in z-scan solve on ``domain.analytic`` closures (pack-free).

    ``n_steps`` defaults to the grid's slab count (dims[p_ax] - 1) so
    accuracy/cost is directly comparable to the segmented march; unlike
    the gridded tracers it can be raised or lowered freely (the field is
    not sampled on any grid).
    """
    if getattr(domain, "analytic", None) is None:
        raise ValueError(
            "domain.analytic is not set: analytic solves need closed-form "
            "closures (test_* constructors provide them; external grids "
            "clear them). Use solver='zscan_seg' for gridded fields.")
    layout = layout_of(domain)
    if probing_depth is None:
        probing_depth = domain.extent
    p_ax = _AXIS_OF[domain.probing_direction]
    a_ax, b_ax = [a for a in range(3) if a != p_ax]

    import numpy as _np
    coords = [_np.asarray(c) for c in (domain.x, domain.y, domain.z)]
    lo = _np.array([c[0] for c in coords])
    hi = _np.array([c[-1] for c in coords])
    p0 = float(coords[p_ax][0])
    p1 = float(coords[p_ax][-1])
    if n_steps is None:
        n_steps = coords[p_ax].shape[0] - 1
    h = (p1 - p0) / n_steps
    omega = float(constants.omega_from_lwl(lwl))

    s = jnp.asarray(s0)
    u = jnp.stack([s[a_ax], s[b_ax], s[3 + a_ax], s[3 + b_ax], s[3 + p_ax],
                   s[6], s[7], s[8]], axis=1)

    start = time.perf_counter()
    uf = trace_zscan_analytic(
        u, domain.analytic, layout, axes=(a_ax, b_ax, p_ax),
        bounds=(lo, hi), omega=omega, lwl=lwl, p0=p0, h=h,
        n_steps=n_steps, integrator=integrator, atten_sign=atten_sign,
        ray_chunk=ray_chunk)
    uf.block_until_ready()
    duration = time.perf_counter() - start

    sf = reassemble_state(uf, p1, domain.probing_direction)
    rf, Jf = ray_to_Jonesvector(sf, probing_depth,
                                probing_direction=domain.probing_direction,
                                return_E=return_E)
    return TraceResult(rf, Jf, sf, duration)
