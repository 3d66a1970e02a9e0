"""FFT dispatcher with an MXU matmul-DFT fallback.

Some TPU runtimes (notably remotely-attached development chips) do not
implement the XLA FFT op or complex-dtype program I/O, which would take
out GRF synthesis, Fresnel propagation and the multi-slice propagator.
The fallback here evaluates the DFT as dense matrix products — for the
n <= 1024 transform sizes this framework uses, an n x n DFT matrix per
axis is a few MB and the contraction runs on the MXU at negligible cost
(~n^4 MACs per axis: ~10 ms for a full 512^3 transform). Complex values
only ever appear as jit-internal intermediates (built from float
constants), never as program inputs/outputs, so the fallback also works
on backends without complex I/O.

Selection is automatic: the first call probes the backend with a tiny
FFT; set the FORCE_MATMUL_DFT=1 environment variable (or call
``force_matmul(True)``) to pin the fallback.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_FORCED = os.environ.get("FORCE_MATMUL_DFT") == "1"
_PROBE_RESULT = None


def force_matmul(value: bool = True) -> None:
    """Pin the matmul-DFT path regardless of backend support."""
    global _FORCED
    _FORCED = value


def _native_fft_works() -> bool:
    global _PROBE_RESULT
    if _PROBE_RESULT is None:
        try:
            x = jnp.zeros((8,), jnp.float32).at[1].set(1.0)

            @jax.jit
            def probe(x):
                return jnp.real(jnp.fft.fft(x)).sum()

            float(probe(x))
            _PROBE_RESULT = True
        except Exception:
            _PROBE_RESULT = False
    return _PROBE_RESULT


def _use_matmul() -> bool:
    return _FORCED or not _native_fft_works()


@lru_cache(maxsize=32)
def _dft_factors(n: int, inverse: bool):
    """(cos, sin) parts of the (i)DFT matrix, cached as HOST numpy arrays
    (a cached jnp array created inside a trace would leak a tracer)."""
    j = np.arange(n)
    sign = 2.0 * np.pi / n if inverse else -2.0 * np.pi / n
    ang = sign * np.outer(j, j)
    scale = 1.0 / n if inverse else 1.0
    return (np.asarray(np.cos(ang) * scale, np.float32),
            np.asarray(np.sin(ang) * scale, np.float32))


def _dft_axis(x: jnp.ndarray, axis: int, inverse: bool) -> jnp.ndarray:
    """Apply an (i)DFT along one axis of a complex array via matmul."""
    n = x.shape[axis]
    cosw, sinw = _dft_factors(n, inverse)
    W = jnp.asarray(cosw) + 1j * jnp.asarray(sinw)  # jit-internal constant
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.tensordot(x, W, axes=[[-1], [1]])
    return jnp.moveaxis(y, -1, axis)


def _matmul_fftn(x: jnp.ndarray, axes, inverse: bool) -> jnp.ndarray:
    x = x.astype(jnp.complex64)
    for ax in axes:
        x = _dft_axis(x, ax, inverse)
    return x


def fftn(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    if _use_matmul():
        return _matmul_fftn(x, axes, inverse=False)
    return jnp.fft.fftn(x, axes=axes)


def ifftn(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    if _use_matmul():
        return _matmul_fftn(x, axes, inverse=True)
    return jnp.fft.ifftn(x, axes=axes)


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    return fftn(x, axes=(x.ndim - 2, x.ndim - 1))


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    return ifftn(x, axes=(x.ndim - 2, x.ndim - 1))


def fftfreq(n: int, d: float = 1.0) -> jnp.ndarray:
    """Host-computed frequency grid (identical to numpy)."""
    return jnp.asarray(np.fft.fftfreq(n, d), jnp.float32)
