"""Scene state: the gridded plasma domain and its trace-ready packing.

``ScalarDomain`` mirrors the user-facing surface of the reference's scene
container (src/simulator/domain.py:62 and src/solvers-legacy/
full_solver.py:96-209 / minimal_solver.py:192-213): coordinate grids,
electron density, optional B / Te / Z fields, physics switches, analytic
test fields, and external-field loading.

The execution-side design differs deliberately:

* Non-cubic grids are first-class (per-axis coordinate vectors) instead of
  the reference's NaN-padding hack (domain.py:283-303).
* ``build_pack`` precomputes the three gradient grids ONCE and packs every
  channel the ODE right-hand side needs into a single (nx, ny, nz, C)
  array. This follows the legacy solver's precompute semantics
  (full_solver.py:228-234) and fixes the modern reference's regression of
  recomputing jnp.gradient on every RHS evaluation (propagator.py:79-89).
* No host-memory auto-batching (domain.py:137-227): a 512^3 float32 pack
  fits comfortably in one TPU's HBM; larger grids are handled by sharding
  (synthpy_tpu.parallel), not host-side slab regeneration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax.numpy as jnp

from synthpy_tpu import constants

AXES = ("x", "y", "z")


def _as_triple(v, name: str) -> Tuple:
    if isinstance(v, (int, float)):
        return (v, v, v)
    v = tuple(v)
    if len(v) != 3:
        raise ValueError(f"{name} must be a scalar or length-3 sequence")
    return v


class ScalarDomain:
    """Gridded plasma scene: n_e (+ optional B, Te, Z) on a uniform grid.

    Create either from (lengths, dims) — coordinates become
    linspace(-L/2, L/2, n) per axis like the reference (domain.py:230-232) —
    or from explicit coordinate vectors (legacy full_solver.py:102 style).

    Args:
        lengths: physical edge length(s) [m], scalar or (Lx, Ly, Lz).
        dims: grid point count(s), scalar or (nx, ny, nz).
        x, y, z: explicit uniform coordinate vectors (alternative to
            lengths/dims).
        ne_type: optional analytic profile name to generate immediately
            ("test_null", "test_slab", "test_linear_cos",
            "test_exponential_cos", "test_lens", "test_liner").
        inv_brems / phaseshift / B_on: physics switches (amplitude
            attenuation, refractive phase accumulation, Faraday rotation).
        probing_direction: 'x', 'y' or 'z'.
    """

    def __init__(
        self,
        lengths: Union[float, Sequence[float], None] = None,
        dims: Union[int, Sequence[int], None] = None,
        *,
        x=None,
        y=None,
        z=None,
        ne_type: Optional[str] = None,
        inv_brems: bool = False,
        phaseshift: bool = False,
        B_on: bool = False,
        probing_direction: str = "z",
        dtype=jnp.float32,
    ):
        if probing_direction not in AXES:
            raise ValueError("probing_direction must be 'x', 'y' or 'z'")
        self.dtype = dtype
        if x is not None:
            self.x = jnp.asarray(x, dtype)
            self.y = jnp.asarray(y, dtype)
            self.z = jnp.asarray(z, dtype)
            # geometry on the host: coordinate vectors are tiny, and some
            # remote TPU runtimes reject scalar-result mini-programs
            import numpy as _np

            self.lengths = tuple(
                float(cn[-1]) - float(cn[0])
                for cn in (_np.asarray(self.x), _np.asarray(self.y),
                           _np.asarray(self.z)))
            self.dims = (self.x.shape[0], self.y.shape[0], self.z.shape[0])
        else:
            if lengths is None or dims is None:
                raise ValueError("pass (lengths, dims) or explicit x/y/z")
            self.lengths = tuple(float(v) for v in _as_triple(lengths, "lengths"))
            self.dims = tuple(int(v) for v in _as_triple(dims, "dims"))
            self.x = jnp.linspace(-self.lengths[0] / 2, self.lengths[0] / 2,
                                  self.dims[0], dtype=dtype)
            self.y = jnp.linspace(-self.lengths[1] / 2, self.lengths[1] / 2,
                                  self.dims[1], dtype=dtype)
            self.z = jnp.linspace(-self.lengths[2] / 2, self.lengths[2] / 2,
                                  self.dims[2], dtype=dtype)

        self.inv_brems = inv_brems
        self.phaseshift = phaseshift
        self.B_on = B_on
        self.probing_direction = probing_direction

        self.ne: Optional[jnp.ndarray] = None
        self.B: Optional[jnp.ndarray] = None
        self.Te: Optional[jnp.ndarray] = None
        self.Z: Optional[jnp.ndarray] = None
        # Closed-form field closures for the pack-free analytic march
        # (tracer.analytic): {"ne": f(x,y,z), optional "B"/"Te"/"Z"}.
        # test_* constructors populate it; external grids clear it.
        self.analytic: Optional[dict] = None

        if ne_type is not None:
            generator = getattr(self, ne_type, None)
            if generator is None:
                raise ValueError(f"unknown ne_type {ne_type!r}")
            generator()

    # -- geometry ----------------------------------------------------------

    @property
    def probe_axis(self) -> int:
        return AXES.index(self.probing_direction)

    @property
    def extent(self) -> float:
        """Half-length along the probing axis [m] (the exit-plane coord)."""
        coords = (self.x, self.y, self.z)[self.probe_axis]
        return float(coords[-1])

    def _mesh(self, *needed: str):
        """Broadcastable coordinate grids without meshgrid materialisation."""
        grids = {
            "x": self.x[:, None, None],
            "y": self.y[None, :, None],
            "z": self.z[None, None, :],
        }
        return tuple(grids[n] for n in needed)

    # -- analytic test fields (the reference's built-in validation suite) ---

    def test_null(self):
        """Empty cube — rays must pass undeflected (full_solver.py:130)."""
        self.ne = jnp.zeros(self.dims, self.dtype)
        self.analytic = {"ne": lambda x, y, z: jnp.zeros_like(x)}
        return self

    def test_slab(self, s: float = 1.0, ne_0: float = 2e23):
        """Linear x-gradient slab: deflects rays in x (full_solver.py:136)."""
        (X,) = self._mesh("x")
        self.ne = (ne_0 * (1.0 + s * X / self.extent)
                   ) * jnp.ones(self.dims, self.dtype)
        ext = self.extent
        self.analytic = {"ne": lambda x, y, z:
                         ne_0 * (1.0 + s * x / ext) + 0.0 * (y + z)}
        return self

    def test_linear_cos(self, s1: float = 0.1, s2: float = 0.1,
                        ne_0: float = 2e23, Ly: float = 1.0):
        """Linearly growing sinusoid (full_solver.py:148)."""
        X, Y = self._mesh("x", "y")
        f = ne_0 * (1.0 + s1 * X / self.extent) * (
            1.0 + s2 * jnp.cos(2 * jnp.pi * Y / Ly))
        self.ne = jnp.broadcast_to(f, self.dims).astype(self.dtype)
        ext = self.extent
        self.analytic = {"ne": lambda x, y, z:
                         ne_0 * (1.0 + s1 * x / ext)
                         * (1.0 + s2 * jnp.cos(2 * jnp.pi * y / Ly))
                         + 0.0 * z}
        return self

    def test_exponential_cos(self, ne_0: float = 1e24, Ly: float = 1e-3,
                             s: float = 2e-3):
        """Exponentially growing sinusoid (full_solver.py:159)."""
        X, Y = self._mesh("x", "y")
        f = ne_0 * 10 ** (X / s) * (1.0 + jnp.cos(2 * jnp.pi * Y / Ly))
        self.ne = jnp.broadcast_to(f, self.dims).astype(self.dtype)
        self.analytic = {"ne": lambda x, y, z:
                         ne_0 * 10 ** (x / s)
                         * (1.0 + jnp.cos(2 * jnp.pi * y / Ly)) + 0.0 * z}
        return self

    def test_lens(self, ne_0: float = 1e24, LR: float = 1e-3):
        """Gaussian column along z — a plasma lens (minimal_solver.py:192)."""
        X, Y = self._mesh("x", "y")
        f = ne_0 * jnp.exp(-(X**2 + Y**2) / LR**2)
        self.ne = jnp.broadcast_to(f, self.dims).astype(self.dtype)
        self.analytic = {"ne": lambda x, y, z:
                         ne_0 * jnp.exp(-(x**2 + y**2) / LR**2) + 0.0 * z}
        return self

    def test_liner(self, ne_0: float = 1e24, LR: float = 1e-3):
        """Gaussian column along y (minimal_solver.py:203)."""
        X, Z = self._mesh("x", "z")
        f = ne_0 * jnp.exp(-(X**2 + Z**2) / LR**2)
        self.ne = jnp.broadcast_to(f, self.dims).astype(self.dtype)
        self.analytic = {"ne": lambda x, y, z:
                         ne_0 * jnp.exp(-(x**2 + z**2) / LR**2) + 0.0 * y}
        return self

    def test_B(self, Bmax: float = 1.0):
        """Bz with linear x-gradient (full_solver.py:201)."""
        (X,) = self._mesh("x")
        B = jnp.zeros((*self.dims, 3), self.dtype)
        self.B = B.at[..., 2].set(
            jnp.broadcast_to(Bmax * X / self.extent, self.dims))
        self.B_on = True
        if self.analytic is not None:
            ext = self.extent
            self.analytic = dict(self.analytic)
            self.analytic["B"] = lambda x, y, z: (
                jnp.zeros_like(x), jnp.zeros_like(x), Bmax * x / ext)
        return self

    # -- external field loading --------------------------------------------

    def _np_dtype(self):
        import numpy as _np

        return _np.dtype(jnp.dtype(self.dtype).name)

    def external_ne(self, ne, host: bool = False):
        """Load an electron-density grid.

        ``host=True`` keeps the array on the HOST as numpy (for fields
        larger than device memory — the streaming pack builder slices
        host arrays plane-batch by plane-batch and never uploads the
        volume; see tracer.zscan.build_segment_pack_streaming).
        """
        if host:
            import numpy as _np

            self.ne = _np.asarray(ne, self._np_dtype())
        else:
            self.ne = jnp.asarray(ne, self.dtype)
        self.analytic = None  # gridded field replaces any closed form
        if self.ne.shape != tuple(self.dims):
            raise ValueError(
                f"ne shape {self.ne.shape} != grid dims {self.dims}")
        return self

    def external_B(self, B, host: bool = False):
        if host:
            import numpy as _np

            self.B = _np.asarray(B, self._np_dtype())
        else:
            self.B = jnp.asarray(B, self.dtype)
        self.B_on = True
        self.analytic = None  # mixed grid/closure packs are not supported
        return self

    def external_Te(self, Te, Te_min: float = 1.0, host: bool = False):
        if host:
            import numpy as _np

            self.Te = _np.maximum(_np.asarray(Te, self._np_dtype()), Te_min)
        else:
            self.Te = jnp.maximum(jnp.asarray(Te, self.dtype), Te_min)
        self.analytic = None
        return self

    def external_Z(self, Z, host: bool = False):
        if host:
            import numpy as _np

            self.Z = _np.asarray(Z, self._np_dtype())
        else:
            self.Z = jnp.asarray(Z, self.dtype)
        self.analytic = None
        return self

    def plot_midline_gradients(self, ax, lwl: float = 1053e-9):
        """Plot the three gradient channels along the probing-axis midline
        (parity: legacy full_solver.py:291-315's debug helper)."""
        import numpy as np

        pack = build_pack(self, lwl)
        ix, iy, iz = (d // 2 for d in self.dims)
        ax_idx = self.probe_axis
        if ax_idx == 0:
            sl = np.s_[:, iy, iz]
            coord = np.asarray(self.x)
        elif ax_idx == 1:
            sl = np.s_[ix, :, iz]
            coord = np.asarray(self.y)
        else:
            sl = np.s_[ix, iy, :]
            coord = np.asarray(self.z)
        for c, name in enumerate(("dn/dx", "dn/dy", "dn/dz")):
            ax.plot(coord, np.asarray(pack.channels[..., c])[sl],
                    label=name)
        ax.legend()
        return ax

    # -- export --------------------------------------------------------------

    def export_scalar_field(self, property: str = "ne",
                            fname: Optional[str] = None) -> str:
        """Write the density grid as .vti + .pvti (see synthpy_tpu.io.vti)."""
        from synthpy_tpu.io import vti

        if property != "ne":
            raise NotImplementedError("only 'ne' export is supported")
        if self.ne is None:
            raise RuntimeError("no electron density loaded")
        return vti.export_scalar_field(
            self.ne, (self.x, self.y, self.z), fname=fname, name="rnec")

    # -- trace packing -------------------------------------------------------

    def build_pack(self, lwl: float = constants.DEFAULT_LWL) -> "TracePack":
        return build_pack(self, lwl)

    # -- legacy-style object API --------------------------------------------
    # The reference ships three propagator API generations (SURVEY.md
    # section 1); this block provides the legacy OO surface
    # (full_solver.py:211,376,405 and the solve_with_E used by
    # interference_MPI.py:129) on top of the functional core, so reference
    # scripts port line-for-line.

    def calc_dndr(self, lwl: float = 1053e-9):
        """Precompute the trace pack (legacy full_solver.py:211-234)."""
        self._pack = build_pack(self, lwl)
        self._lwl = lwl
        return self

    def _ensure_pack(self):
        if getattr(self, "_pack", None) is None:
            self.calc_dndr()
        return self._pack

    def solve(self, s0, return_E: bool = False, solver: str = "zscan",
              critical_guard: Optional[float] = 0.85, **kwargs):
        """Trace rays and store rf/Jf/sf (legacy full_solver.py:376-403).

        Falls back to the time-domain tracer (with a warning) when
        max(ne)/nc >= ``critical_guard`` and a z-scan solver was
        requested — see :func:`peak_ne_over_nc`. None disables.
        """
        pack = self._ensure_pack()
        if (critical_guard is not None and self.ne is not None
                and solver in ("zscan", "zscan_seg")):
            frac = peak_ne_over_nc(self, getattr(self, "_lwl",
                                                 constants.DEFAULT_LWL))
            if frac >= critical_guard:
                import warnings

                warnings.warn(
                    f"max(ne)/nc = {frac:.3f} >= {critical_guard}: "
                    "falling back to the time-domain tracer.",
                    stacklevel=2)
                solver = "time"
        if solver == "zscan_seg":
            from synthpy_tpu.tracer.zscan import solve_zscan_segments

            res = solve_zscan_segments(s0, self, lwl=self._lwl,
                                       return_E=True, pack=pack, **kwargs)
        elif solver == "zscan":
            from synthpy_tpu.tracer.zscan import solve_zscan

            res = solve_zscan(s0, self, lwl=self._lwl, return_E=True,
                              pack=pack, **kwargs)
        else:
            from synthpy_tpu.tracer.propagator import solve as _solve

            res = _solve(s0, self, lwl=self._lwl, return_E=True, pack=pack,
                         **kwargs)
        self.rf, self.Jf, self.sf = res.rf, res.Jf, res.sf
        if return_E:
            return self.rf, self.Jf
        return self.rf

    def solve_with_E(self, s0, **kwargs):
        """rf + Jones vectors in one call (the API interference_MPI.py:129
        expects but no reference source file still defines)."""
        return self.solve(s0, return_E=True, **kwargs)

    def solve_at_depth(self, s0, depth: float, **kwargs):
        """Partial trace: integrate for t = depth/c only, then project to
        the exit plane (legacy full_solver.py:405-425)."""
        from synthpy_tpu.constants import C
        from synthpy_tpu.tracer.propagator import solve as _solve

        pack = self._ensure_pack()
        res = _solve(s0, self, lwl=self._lwl, return_E=True, pack=pack,
                     t_end=depth / C, **kwargs)
        self.rf, self.Jf, self.sf = res.rf, res.Jf, res.sf
        return self.rf

    def clear_memory(self):
        """Drop large intermediates (legacy full_solver.py:427-440)."""
        self._pack = None
        self.sf = None
        self.rf = None
        self.Jf = None
        return self


class ChannelLayout(NamedTuple):
    """Static description of what lives in each pack channel (hashable)."""

    inv_brems: bool
    phaseshift: bool
    B_on: bool

    @property
    def n_channels(self) -> int:
        return 3 + self.inv_brems + self.phaseshift + 3 * self.B_on

    @property
    def kappa_index(self) -> int:
        return 3

    @property
    def phase_index(self) -> int:
        return 3 + self.inv_brems

    @property
    def faraday_index(self) -> int:
        return 3 + self.inv_brems + self.phaseshift


class TracePack(NamedTuple):
    """Immutable, jit-friendly bundle consumed by the tracer.

    channels: (nx, ny, nz, C) with C = 3 gradient components
        (-c^2/2 * d(ne/nc)/dx_i, the acceleration field), then optionally
        kappa [1/s], omega*(n-1) [rad/s], and Verdet*ne*B [rad/m * s/m].
        All channels are exactly zero outside the box, so a single
        fill_value=0 interpolation covers every term.
    """

    channels: jnp.ndarray
    origin: jnp.ndarray
    inv_spacing: jnp.ndarray
    omega: float


def build_pack(domain: ScalarDomain,
               lwl: float = constants.DEFAULT_LWL,
               dtype=None,
               ne_max: float | None = None) -> TracePack:
    """Precompute the packed RHS channel grid for a domain.

    Gradients use second-order central differences (one-sided at the
    boundary), matching numpy.gradient as used by the legacy precompute
    (full_solver.py:228-230). ``dtype`` overrides the stored channel dtype
    (e.g. bfloat16 halves the pack for 1024^3-class grids). ``ne_max``
    clips ne/nc before differentiating, capping gradients near critical
    surfaces (parity: minimal_solver.py:222-243's ne_max).
    """
    if domain.ne is None:
        raise RuntimeError("domain has no electron density")
    omega = float(constants.omega_from_lwl(lwl))
    nc = float(constants.critical_density(omega))
    ne_nc = domain.ne / nc
    if ne_max is not None:
        ne_nc = jnp.minimum(ne_nc, ne_max)

    # Scalar spacings (grids are uniform by construction): the plain central
    # difference cancels exactly for constant fields, unlike the
    # coordinate-array quadratic formula which leaves f32 rounding residue.
    import numpy as _np
    spacings = [float(_np.asarray(c)[1] - _np.asarray(c)[0])
                for c in (domain.x, domain.y, domain.z)]
    grads = jnp.gradient(ne_nc, *spacings)
    chans = [(-0.5 * constants.C**2) * g for g in grads]

    if domain.inv_brems:
        if domain.Te is None or domain.Z is None:
            raise RuntimeError("inv_brems requires Te and Z grids")
        chans.append(constants.kappa(domain.ne, domain.Te, domain.Z, omega))
    if domain.phaseshift:
        chans.append(omega * (constants.n_refrac(domain.ne, omega) - 1.0))
    if domain.B_on:
        if domain.B is None:
            raise RuntimeError("B_on requires a B grid")
        verdet = constants.verdet_constant(lwl)
        for i in range(3):
            chans.append(verdet * domain.ne * domain.B[..., i])

    channels = jnp.stack(
        [c.astype(dtype or domain.dtype) for c in chans], axis=-1)
    # Geometry is derived HOST-SIDE (numpy) and stays a concrete numpy
    # array in the pack: coordinate vectors never trace, and concrete
    # geometry lets make_zscan_pack take float() on it even while the
    # channel math above is being traced under jit/grad
    # (synthpy_tpu.inverse.make_renderer differentiates through here).
    # numpy operands are valid jit inputs everywhere the pack is consumed.
    cs = [_np.asarray(c) for c in (domain.x, domain.y, domain.z)]
    np_dt = _np.dtype(jnp.dtype(domain.dtype).name)
    origin = _np.stack([c[0] for c in cs]).astype(np_dt)
    inv_spacing = _np.stack([1.0 / (c[1] - c[0])
                             for c in cs]).astype(np_dt)
    return TracePack(channels, origin, inv_spacing, omega)


def layout_of(domain: ScalarDomain) -> ChannelLayout:
    return ChannelLayout(domain.inv_brems, domain.phaseshift, domain.B_on)


def peak_ne_over_nc(domain: ScalarDomain,
                    lwl: float = constants.DEFAULT_LWL) -> float:
    """max(ne)/nc for the probe wavelength, or 0.0 if ne was freed.

    Used by the critical-density guard: the z-scan solvers reparameterise
    the ray ODE by the probing coordinate and divide by v_p, which is
    ill-conditioned near turning points (v_p -> 0 where ne -> nc). The
    reference has no such guard — its zscan-analogue solver silently
    produces garbage for overcritical fields (minimal_solver.py:222-243
    only clips gradients via ne_max).

    The reduction runs as one jitted program with float-only I/O (eager
    scalar mini-programs are unreliable on remotely-attached runtimes),
    and is memoized per (ne array, lwl) so repeated pipeline.run calls on
    the same field pay no extra dispatch (~80 ms RPC on remote-attached
    chips).
    """
    if domain.ne is None:
        return 0.0
    import weakref

    cached = getattr(domain, "_peak_cache", None)
    if cached is not None:
        ref, clwl, val = cached
        if ref() is domain.ne and clwl == float(lwl):
            return val
    import jax

    import numpy as np

    nc = float(constants.critical_density(constants.omega_from_lwl(lwl)))
    if isinstance(domain.ne, np.ndarray):
        # host-resident field (external_ne(host=True)): reduce on the host —
        # device_put-ing a >HBM volume for a scalar max would OOM the chip
        # the streamed-pack path exists to protect
        frac = float(np.max(domain.ne)) / nc
    else:
        frac = float(jax.jit(jnp.max)(domain.ne)) / nc
    domain._peak_cache = (weakref.ref(domain.ne), float(lwl), frac)
    return frac
