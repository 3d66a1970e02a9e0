"""Regularisation priors for inverse problems (ROADMAP round-3+ item).

Three families, all plain jnp chains (reverse-mode differentiable, VPU/
MXU-friendly), designed to plug into a ``loss = data + w * prior`` sum
next to :mod:`synthpy_tpu.inverse`:

- :func:`tv` — isotropic-in-sum total variation (the pixel-space prior
  the joint-inversion demo used inline; promoted here so every script
  shares one definition).
- :func:`haar_l1` — sparsity of the multi-level 2-D Haar wavelet
  transform: edges and blobs stay cheap, high-frequency speckle is
  taxed. Implemented from scratch (no pywavelets in the image) as
  average/difference pyramids — exactly orthonormal per level.
- :func:`make_grf_whitener` — the GRF-spectrum prior, implemented the
  statistically exact way: REPARAMETERISE the unknown field as
  ``g = colorize(theta)`` where ``colorize`` shapes white noise by
  sqrt(E(k)) (the same Timmer-König construction as
  :func:`synthpy_tpu.fields.grf.grf_fft`, reference
  field_generator/gaussian3D.py:153-212). A standard-normal penalty
  ``white_l2(theta)`` on the white-space variable is then EXACTLY the
  Gaussian log-prior of the colored field — no ill-conditioned 1/S(k)
  weighting of the field itself, and gradient descent preconditions
  itself for free (every k-mode has unit prior curvature).

Turbulence-recovery usage::

    colorize, n_modes = make_grf_whitener((128, 128), dx, kolmogorov)
    def loss(theta):
        g = g0 + sigma * colorize(theta)
        return data_misfit(render(g)) + w * white_l2(theta)

All functions accept 2-D or 3-D fields.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from synthpy_tpu.fields.grf import _safe_spectrum
from synthpy_tpu.ops import dft

__all__ = ["tv", "haar_l1", "haar2d", "ihaar2d", "make_grf_whitener",
           "make_grf_modal", "white_l2"]


def tv(g: jnp.ndarray, axes: Sequence[int] | None = None) -> jnp.ndarray:
    """Anisotropic total variation: sum over axes of mean |forward diff|.

    Matches the inline prior of examples/inverse_volume_joint.py (round
    3) so existing tuned weights carry over unchanged.
    """
    if axes is None:
        axes = range(g.ndim)
    return sum(jnp.mean(jnp.abs(jnp.diff(g, axis=a))) for a in axes)


# ---------------------------------------------------------------------------
# Haar wavelet sparsity
# ---------------------------------------------------------------------------

def _haar_once(g: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """One orthonormal 2-D Haar analysis step on the leading two axes."""
    a = (g[0::2] + g[1::2]) / jnp.sqrt(2.0)
    d = (g[0::2] - g[1::2]) / jnp.sqrt(2.0)
    aa = (a[:, 0::2] + a[:, 1::2]) / jnp.sqrt(2.0)   # LL
    ad = (a[:, 0::2] - a[:, 1::2]) / jnp.sqrt(2.0)   # LH
    da = (d[:, 0::2] + d[:, 1::2]) / jnp.sqrt(2.0)   # HL
    dd = (d[:, 0::2] - d[:, 1::2]) / jnp.sqrt(2.0)   # HH
    return aa, (ad, da, dd)


def haar2d(g: jnp.ndarray, levels: int = 3):
    """Multi-level orthonormal 2-D Haar transform.

    Returns ``(approx, details)`` where ``details`` is a list (coarsest
    last) of (LH, HL, HH) triples. Requires the leading two axis lengths
    be divisible by 2**levels.
    """
    for n, lv in zip(g.shape[:2], (levels, levels)):
        if n % (1 << lv):
            raise ValueError(
                f"haar2d: axis length {n} not divisible by 2^{lv}")
    details = []
    a = g
    for _ in range(levels):
        a, d = _haar_once(a)
        details.append(d)
    return a, details


def ihaar2d(approx: jnp.ndarray, details) -> jnp.ndarray:
    """Inverse of :func:`haar2d` (exact, orthonormal)."""
    a = approx
    for ad, da, dd in reversed(details):
        # undo column step
        c0 = (a + ad) / jnp.sqrt(2.0)
        c1 = (a - ad) / jnp.sqrt(2.0)
        e0 = (da + dd) / jnp.sqrt(2.0)
        e1 = (da - dd) / jnp.sqrt(2.0)
        ny = a.shape[1] * 2
        av = jnp.stack([c0, c1], axis=2).reshape(a.shape[0], ny,
                                                 *a.shape[2:])
        dv = jnp.stack([e0, e1], axis=2).reshape(a.shape[0], ny,
                                                 *a.shape[2:])
        # undo row step
        r0 = (av + dv) / jnp.sqrt(2.0)
        r1 = (av - dv) / jnp.sqrt(2.0)
        a = jnp.stack([r0, r1], axis=1).reshape(a.shape[0] * 2, ny,
                                                *a.shape[2:])
    return a


def haar_l1(g: jnp.ndarray, levels: int = 3,
            detail_only: bool = True) -> jnp.ndarray:
    """Mean |Haar detail coefficient| over ``levels`` scales.

    ``detail_only`` (default) leaves the coarse approximation
    unpenalised — the prior taxes texture, not the bulk density the
    data term is busy fitting. 3-D fields are penalised slice-wise on
    the leading two axes (the 2.5-D ansatz of the inversion demos).
    """
    a, details = haar2d(g, levels)
    total = sum(jnp.abs(x).mean() for tri in details for x in tri)
    if not detail_only:
        total = total + jnp.abs(a).mean()
    return total / (3 * levels + (0 if detail_only else 1))


# ---------------------------------------------------------------------------
# GRF-spectrum prior via whitening reparameterisation
# ---------------------------------------------------------------------------

def make_grf_whitener(
    shape: Tuple[int, ...],
    spacing: float | Sequence[float],
    k_func: Callable,
    l_max: float | None = None,
    l_min: float | None = None,
) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], int]:
    """Build ``colorize(theta) -> g`` shaping white noise by sqrt(E(k)).

    ``theta`` (real, ``shape``) is interpreted as unit white noise;
    ``colorize`` filters it in Fourier space with sqrt(E(|k|)) (|k| in
    rad/length from the grid ``spacing``, band-limited to
    [2*pi/l_max, 2*pi/l_min] when given — the same band convention as
    :func:`fields.grf.grf_domain_fft`), zeroes the DC mode and
    normalises so that standard-normal theta yields a UNIT-VARIANCE
    field. The pair (colorize, :func:`white_l2`) is then an exact
    Gaussian process prior with covariance spectrum E(k): maximising
    ``-data_misfit(colorize(theta)) - white_l2(theta)`` is MAP inference
    under that GP.

    Returns ``(colorize, n_active_modes)``; a zero-mode band raises.
    Everything runs through :mod:`ops.dft`, so it works on TPU runtimes
    without the native FFT op.
    """
    ndim = len(shape)
    if jnp.ndim(spacing) == 0:
        spacing = (float(spacing),) * ndim
    ks = [2 * jnp.pi * dft.fftfreq(n, d=s) for n, s in zip(shape, spacing)]
    kgrids = jnp.meshgrid(*ks, indexing="ij")
    k = jnp.sqrt(sum(g**2 for g in kgrids))
    S = _safe_spectrum(k_func, k)
    if l_max is not None:
        S = jnp.where(k >= 2 * jnp.pi / l_max, S, 0.0)
    if l_min is not None:
        S = jnp.where(k <= 2 * jnp.pi / l_min, S, 0.0)
    amp = jnp.sqrt(S)
    n_active = int((S > 0).sum())
    if n_active == 0:
        raise ValueError("GRF prior band contains no modes: check "
                         "l_max/l_min against the grid Nyquist range")
    # normalise: var(g) = mean(amp^2) * var(theta) under orthonormal DFT
    # scaling; with numpy-convention fftn/ifftn the field variance for
    # unit white theta is sum(amp^2)/n_tot^2 * n_tot = mean(amp^2)
    amp = amp / jnp.sqrt(jnp.mean(amp**2))

    # jitted so the complex DFT intermediates stay INSIDE one program:
    # eager op-by-op execution would round-trip complex arrays through
    # the runtime between ops, which remote-attached TPU services
    # reject (see ops.dft module docstring) — measured failing on the
    # axon backend when colorize was called eagerly for a final render.
    @jax.jit
    def colorize(theta: jnp.ndarray) -> jnp.ndarray:
        F = dft.fftn(theta.astype(jnp.float32))
        return jnp.real(dft.ifftn(F * amp))

    return colorize, n_active


def make_grf_modal(
    shape: Tuple[int, ...],
    spacing: float | Sequence[float],
    k_func: Callable,
    l_max: float | None = None,
    l_min: float | None = None,
) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], int]:
    """GP prior parameterised IN MODE SPACE: ``synth(u) -> g``.

    ``u`` is a real ``(n_modes, 2)`` array — (cos, -sin) coefficients of
    the canonical half of the band-limited active modes, in PRIOR-scaled
    units: ``g(x) = sum_k tau_k [u_k0 cos(kx) - u_k1 sin(kx)]`` with
    ``tau_k ~ sqrt(E(|k|))`` normalised so standard-normal ``u`` yields
    a unit-variance field. :func:`white_l2`(u) is then exactly the
    Gaussian log-prior, identically to :func:`make_grf_whitener`.

    Why this exists (round-5 fix for the 128^3 tomography divergence):
    the real-space whitened parameterisation composes badly with Adam.
    Adam's per-element normalisation moves theta by ~lr per iteration
    REGARDLESS of the gradient magnitude, and the whitening gain of the
    lowest-k modes GROWS with resolution (measured: max per-mode gain
    30 at 33^3 -> 230 at 128^3 for a k^-4 band, because the
    unit-variance normalisation averages over the full grid while the
    active-band fraction shrinks) — so one Adam step at 128^3 swings
    the field by SIG * 230 * lr ~ +-27 and the fit diverges (the
    recorded rel_l2_full 581, scratch/results_tomography_r4.jsonl).
    Here a step of lr moves field mode k by tau_k * lr <= lr (since
    sum tau^2 = 1): bounded, resolution-independent — per-mode learning
    rates proportioned to the prior, for free. The parameter count also
    drops from prod(shape) to n_modes (~34k for the tomography band at
    128^3 vs 2.1M), matching the information the band can carry.

    Returns ``(synth, n_modes)``. Everything runs through
    :mod:`ops.dft` (works on TPU runtimes without a native FFT op);
    ``synth`` is jitted with the scatter indices and tau closed over.
    """
    ndim = len(shape)
    if jnp.ndim(spacing) == 0:
        spacing = (float(spacing),) * ndim
    import numpy as np

    ks = [2 * np.pi * np.fft.fftfreq(n, d=s) for n, s in zip(shape, spacing)]
    kgrids = np.meshgrid(*ks, indexing="ij")
    k = np.sqrt(sum(g**2 for g in kgrids))
    S = np.asarray(_safe_spectrum(k_func, jnp.asarray(k)))
    if l_max is not None:
        S = np.where(k >= 2 * np.pi / l_max, S, 0.0)
    if l_min is not None:
        S = np.where(k <= 2 * np.pi / l_min, S, 0.0)
    S[(0,) * ndim] = 0.0
    # canonical half-spectrum: first nonzero signed frequency positive —
    # each retained k represents its conjugate pair, so (cos, sin)
    # coefficients span exactly the real fields the full band spans
    half = np.zeros(shape, bool)
    cond = np.ones(shape, bool)
    for g in kgrids:
        half |= cond & (g > 1e-12)
        cond &= np.abs(g) <= 1e-12
    sel = (S > 0) & half
    n_modes = int(sel.sum())
    if n_modes == 0:
        raise ValueError("GRF modal band contains no modes: check "
                         "l_max/l_min against the grid Nyquist range")
    idx = np.flatnonzero(sel.ravel())
    tau = np.sqrt(S.ravel()[idx])
    tau = tau / np.sqrt((tau**2).sum())   # var(g) = sum tau^2 = 1
    n_tot = int(np.prod(shape))
    idx_j = jnp.asarray(idx, jnp.int32)
    tau_j = jnp.asarray(tau, jnp.float32)

    @jax.jit
    def synth(u: jnp.ndarray) -> jnp.ndarray:
        coef = tau_j * (u[:, 0] + 1j * u[:, 1]) * n_tot
        C = jnp.zeros((n_tot,), jnp.complex64).at[idx_j].set(coef)
        return jnp.real(dft.ifftn(C.reshape(shape)))

    return synth, n_modes


def white_l2(theta: jnp.ndarray) -> jnp.ndarray:
    """Standard-normal negative log-prior (per element): mean(theta^2)/2."""
    return 0.5 * jnp.mean(theta**2)
