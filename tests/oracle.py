"""Independent NumPy/SciPy ground-truth ray tracer used only by tests.

Implements the same physics as synthpy_tpu.tracer from first principles
(PhysRevE.61.895: v' = -grad(c^2/2 * ne/nc), x' = v, plus amplitude/phase/
polarisation quadratures) with an adaptive high-accuracy integrator
(solve_ivp, RK45, rtol=1e-10). This plays the role the legacy NumPy solver
plays for the reference: the slow oracle that the fast device code must
match ray-for-ray (reference run_scripts/solver_comparisons.py:64-85).
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp
from scipy.interpolate import RegularGridInterpolator as RGI

C = 2.99792458e8
E_CHARGE = 1.602176634e-19


def _omega_pe(ne_cc):
    return 5.64e4 * np.sqrt(ne_cc)


def _kappa(ne, Te, Z, omega):
    ne_cc = ne * 1e-6
    o_max = np.maximum(_omega_pe(ne_cc), omega)
    L_max = np.maximum(Z * E_CHARGE / Te, 2.760428269727312e-10 / np.sqrt(Te))
    CL = np.maximum(2.0, np.log(4.19e5 * np.sqrt(Te) / (o_max * L_max)))
    return 3.1e-5 * Z * C * (ne_cc / omega) ** 2 * CL * Te ** (-1.5)


def _n_refrac(ne, omega):
    return np.sqrt(np.maximum(1.0 - (_omega_pe(ne * 1e-6) / omega) ** 2, 0.0))


class OracleTracer:
    """Adaptive-integrator ray tracer over a gridded density field."""

    def __init__(self, x, y, z, ne, lwl=1064e-9, *, Te=None, Z=None, B=None,
                 inv_brems=False, phaseshift=False, B_on=False,
                 atten_sign=-1.0):
        x, y, z, ne = (np.asarray(v, np.float64) for v in (x, y, z, ne))
        self.omega = 2 * np.pi * C / lwl
        nc = 3.14207787e-4 * self.omega**2
        ne_nc = ne / nc

        dx, dy, dz = x[1] - x[0], y[1] - y[0], z[1] - z[0]
        pts = (x, y, z)
        mk = lambda v, fill=0.0: RGI(pts, v, bounds_error=False,
                                     fill_value=fill)
        self.grad_interp = [
            mk(-0.5 * C**2 * np.gradient(ne_nc, dx, axis=0)),
            mk(-0.5 * C**2 * np.gradient(ne_nc, dy, axis=1)),
            mk(-0.5 * C**2 * np.gradient(ne_nc, dz, axis=2)),
        ]
        self.inv_brems = inv_brems
        self.phaseshift = phaseshift
        self.B_on = B_on
        self.atten_sign = atten_sign
        if inv_brems:
            self.kappa_interp = mk(_kappa(ne, np.asarray(Te, np.float64),
                                          np.asarray(Z, np.float64),
                                          self.omega))
        if phaseshift:
            self.phase_interp = mk(self.omega
                                   * (_n_refrac(ne, self.omega) - 1.0))
        if B_on:
            verdet = 2.62e-13 * lwl**2
            self.W_interp = [mk(verdet * ne * np.asarray(B)[..., i])
                             for i in range(3)]

    def _dsdt(self, t, s):
        Np = s.size // 9
        s = s.reshape(9, Np)
        out = np.zeros_like(s)
        r = s[:3].T
        v = s[3:6]
        out[:3] = v
        for i in range(3):
            out[3 + i] = self.grad_interp[i](r)
        if self.inv_brems:
            out[6] = self.atten_sign * self.kappa_interp(r) * s[6]
        if self.phaseshift:
            out[7] = self.phase_interp(r)
        if self.B_on:
            Bv = sum(self.W_interp[i](r) * v[i] for i in range(3))
            out[8] = Bv
        return out.ravel()

    def solve(self, s0, probing_depth):
        """Integrate to t_end = sqrt(8) * depth / c; returns (9, Np)."""
        s0 = np.asarray(s0, np.float64)
        Np = s0.shape[1]
        t_end = np.sqrt(8.0) * probing_depth / C
        sol = solve_ivp(self._dsdt, [0.0, t_end], s0.ravel(),
                        rtol=1e-10, atol=1e-12, dense_output=False)
        return sol.y[:, -1].reshape(9, Np)


def ray_to_rtm(sf, ne_extent, probing_direction="z"):
    """NumPy exit-plane projection (independent of the jax version)."""
    ax = {"x": 0, "y": 1, "z": 2}[probing_direction]
    trans = {"x": (1, 2), "y": (2, 0), "z": (0, 1)}[probing_direction]
    t_bp = (sf[ax] - ne_extent) / sf[3 + ax]
    rows = []
    for a in trans:
        rows.append(sf[a] - sf[3 + a] * t_bp)
        rows.append(np.arctan(sf[3 + a] / sf[3 + ax]))
    return np.stack(rows)
