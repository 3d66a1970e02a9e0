"""Physical constants and plasma-physics helper functions.

These are the scalar formulas every other module builds on. Numerical values
and unit conventions follow the reference implementation so that results are
bit-comparable where the physics overlaps (reference: src/simulator/
propagator.py:23-64 and src/solvers-legacy/full_solver.py:236-274):

* electron plasma frequency  ``omega_pe = 5.64e4 * sqrt(n_e[cm^-3])`` rad/s
  (NRL formulary p.28),
* critical density ``n_c = 3.14207787e-4 * omega**2`` m^-3
  (= epsilon_0 m_e / e^2 * omega^2, reference full_solver.py:219),
* plasma refractive index ``n = sqrt(1 - (omega_pe/omega)^2)``,
* NRL inverse-bremsstrahlung rate coefficient ``kappa`` in 1/s
  (reference propagator.py:30-60),
* Verdet constant ``2.62e-13 * lwl^2`` rad/T/m^2 for Faraday rotation
  (reference propagator.py:352-355).

All functions are pure jnp and safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

# Speed of light in vacuum [m/s] (scipy.constants.c).
C = 2.99792458e8
# Elementary charge [C] (scipy.constants.e).
E_CHARGE = 1.602176634e-19

# n_c = N_C_COEFF * omega^2  [m^-3]; N_C_COEFF = epsilon_0 m_e / e^2.
N_C_COEFF = 3.14207787e-4
# omega_pe = OMEGA_PE_COEFF * sqrt(n_e [cm^-3])  [rad/s].
OMEGA_PE_COEFF = 5.64e4
# v_the = V_THE_COEFF * sqrt(Te [eV])  [m/s].
V_THE_COEFF = 4.19e5
# L_quantum = L_QUANTUM_COEFF / sqrt(Te)  (= hbar / sqrt(m_e e Te)).
L_QUANTUM_COEFF = 2.760428269727312e-10
# kappa = KAPPA_COEFF * Z * c * (ne_cc/omega)^2 * CL * Te^-1.5  [1/s].
KAPPA_COEFF = 3.1e-5
# VerdetConst = VERDET_COEFF * lwl^2  [rad/T/m^2].
VERDET_COEFF = 2.62e-13

# Default probe wavelength [m] used across the reference examples.
DEFAULT_LWL = 1064e-9

# Proton rest mass [kg] and rest energy [MeV] (CODATA 2018) — charged-
# particle radiography (tracer.particles), beyond the reference's
# optical-only probes.
M_PROTON = 1.67262192369e-27
PROTON_REST_MEV = 938.27208816
MEV = 1.602176634e-13  # J per MeV


def omega_from_lwl(lwl: float) -> float:
    """Angular laser frequency [rad/s] from vacuum wavelength [m]."""
    return 2.0 * jnp.pi * C / lwl


def critical_density(omega) -> jnp.ndarray:
    """Critical electron density n_c [m^-3] for angular frequency omega."""
    return N_C_COEFF * omega**2


def omega_pe(ne_cc):
    """Electron plasma frequency [rad/s]; ``ne_cc`` in cm^-3 (NRL pp. 28)."""
    return OMEGA_PE_COEFF * jnp.sqrt(ne_cc)


def v_the(Te):
    """Electron thermal speed [m/s]; ``Te`` in eV."""
    return V_THE_COEFF * jnp.sqrt(Te)


def n_refrac(ne, omega):
    """Plasma refractive index; ``ne`` in m^-3.

    Clamped at zero under the square root so that overdense cells produce
    n = 0 rather than NaN (the reference would NaN here; rays never enter
    overdense regions in its use cases, so the clamp is behaviour-neutral).

    Gradient-safe at and beyond critical: the clamp alone leaves
    ``d sqrt(max(x, 0))`` as ``inf * 0 = NaN`` for x <= 0, which poisons
    every jax.grad through the phase channel the moment an optimiser
    iterate crosses n_c anywhere in the volume (observed: the multi-view
    tomography fit at 128^3 NaN'd within 20 Adam steps). The double-where
    makes the overdense branch a true constant (gradient 0).
    """
    # ratio^2 is LINEAR in ne — compute it without omega_pe's sqrt(ne),
    # whose AD at ne == 0 is another 0 * inf = NaN (exact-vacuum voxels
    # are common optimiser iterates)
    arg = 1.0 - (OMEGA_PE_COEFF**2 * 1e-6 / omega**2) * ne
    safe = jnp.where(arg > 0.0, arg, 1.0)
    return jnp.where(arg > 0.0, jnp.sqrt(safe), 0.0)


def coulomb_log(ne_cc, Te, Z, omega):
    """Coulomb logarithm, floored at 2.0 (reference propagator.py:49-50)."""
    o_pe = omega_pe(ne_cc)
    o_max = jnp.maximum(o_pe, omega)
    L_classical = Z * E_CHARGE / Te
    L_quantum = L_QUANTUM_COEFF / jnp.sqrt(Te)
    L_max = jnp.maximum(L_classical, L_quantum)
    return jnp.maximum(2.0, jnp.log(v_the(Te) / (o_max * L_max)))


def kappa(ne, Te, Z, omega):
    """NRL inverse-bremsstrahlung rate coefficient [1/s].

    ``ne`` in m^-3, ``Te`` in eV, ``Z`` ionisation, ``omega`` rad/s.
    Matches reference propagator.py:30-60 / full_solver.py:243-268.
    """
    ne_cc = ne * 1e-6
    CL = coulomb_log(ne_cc, Te, Z, omega)
    return KAPPA_COEFF * Z * C * (ne_cc / omega) ** 2 * CL * Te ** (-1.5)


def verdet_constant(lwl: float) -> float:
    """Faraday-rotation Verdet constant [rad/T/m^2] for wavelength ``lwl``."""
    return VERDET_COEFF * lwl**2
