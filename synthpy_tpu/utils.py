"""Small numeric and bookkeeping utilities.

Covers the reference's src/simulator/utils.py surface that is still relevant
on TPU: seeded RNG helpers (utils.py:8-24 — but built on jax.random instead
of process-global numpy seeding), memory estimation helpers (utils.py:37-94),
and number formatting (utils.py:96-107).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# RNG
# ---------------------------------------------------------------------------

def key_from_seed(seed: int | None) -> jax.Array:
    """Make a PRNG key; ``None`` draws entropy from the OS.

    The reference seeds numpy's *global* RNG (utils.py:8-24, SEEDED flag);
    functional keys are the jax-native equivalent and are what every
    synthpy_tpu API accepts.
    """
    if seed is None:
        seed = int.from_bytes(__import__("os").urandom(4), "little")
    return jax.random.PRNGKey(seed)


# ---------------------------------------------------------------------------
# Memory bookkeeping (host-side planning helpers, not used in jitted code)
# ---------------------------------------------------------------------------

_UNITS = ("B", "KB", "MB", "GB", "TB")


def mem_conversion(n_bytes: float) -> str:
    """Human-readable byte count (parity: reference utils.py:40-66)."""
    n = float(n_bytes)
    for unit in _UNITS:
        if abs(n) < 1024.0 or unit == _UNITS[-1]:
            return f"{n:.2f} {unit}"
        n /= 1024.0
    return f"{n:.2f} TB"


def domain_estimate(dims: Sequence[int], dtype_bytes: int = 4,
                    channels: int = 1) -> int:
    """Bytes needed for one ``dims`` grid (reference utils.py:76-77)."""
    n = 1
    for d in dims:
        n *= int(d)
    return n * dtype_bytes * channels


def hbm_bytes_per_device() -> int | None:
    """Free HBM bytes on the first addressable device, if discoverable."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats is None:
            return None
        limit = stats.get("bytes_limit")
        used = stats.get("bytes_in_use", 0)
        if limit is None:
            return None
        return int(limit) - int(used)
    except Exception:
        return None


def peak_hbm_gb(device=None) -> float | None:
    """True peak device HBM usage in GiB, or ``None`` when unmeasurable.

    Reads ``memory_stats()['peak_bytes_in_use']``. On backends that
    expose no memory stats (remote-attached TPU runtimes return None —
    and ``jax.profiler.save_device_memory_profile`` is an uncatchable
    PJRT FATAL there, measured round 5, so it is NOT a usable fallback)
    this returns ``None``: callers must serialise that as JSON null,
    never 0.0, and may log :func:`live_hbm_gb` alongside as an honest
    lower bound.
    """
    try:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return float(peak) / 2**30 if peak else None


def live_hbm_gb() -> float:
    """GiB of Python-visible live device arrays right now.

    Sum of ``a.nbytes`` over ``jax.live_arrays()`` — counts persistent
    buffers (packs, params, optimiser state) but NOT transients inside a
    running jitted program, so it is a lower bound on the true peak.
    Works on every backend, including ones where ``memory_stats()`` and
    the heap profiler are unavailable (see :func:`peak_hbm_gb`).
    """
    try:
        return sum(a.nbytes for a in jax.live_arrays()) / 2**30
    except Exception:
        return 0.0


# ---------------------------------------------------------------------------
# Number formatting
# ---------------------------------------------------------------------------

def round_to_n(x: float, n: int) -> float:
    """Round ``x`` to ``n`` significant figures (reference utils.py:96-100)."""
    if x == 0:
        return 0.0
    from math import floor, log10

    return round(x, -int(floor(log10(abs(x)))) + (n - 1))


def add_integer_postfix(i: int) -> str:
    """1 -> '1st', 2 -> '2nd', ... (reference utils.py:79-94)."""
    if 10 <= i % 100 <= 20:
        suffix = "th"
    else:
        suffix = {1: "st", 2: "nd", 3: "rd"}.get(i % 10, "th")
    return f"{i}{suffix}"


# ---------------------------------------------------------------------------
# HPC log post-processing
# ---------------------------------------------------------------------------

_ANSI_RE = None


def strip_ansi(text: str) -> str:
    """Remove ANSI colour/control codes from captured logs."""
    global _ANSI_RE
    if _ANSI_RE is None:
        import re

        _ANSI_RE = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")
    return _ANSI_RE.sub("", text)


def parse_hpc_error(text: str) -> str:
    """Decode JSON-wrapped stack traces from batch-job logs.

    Parity with the reference's post-hoc error reader
    (evaluation/error_reading/error_parser.py:1-42): cluster runners wrap
    tracebacks in JSON with escaped newlines and ANSI colours; this
    unwraps and strips them into a readable traceback.
    """
    import json

    text = strip_ansi(text)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and "Traceback" in line:
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            for v in obj.values():
                if isinstance(v, str) and "Traceback" in v:
                    return v.replace("\\n", "\n")
    return text


# ---------------------------------------------------------------------------
# Quick-look plotting (host-side; matplotlib imported lazily)
# ---------------------------------------------------------------------------

def base_ray_plot(rf, nbins: int = 201, ax=None):
    """2-D histogram quick-look of exit rays (reference utils.py:216-231)."""
    import matplotlib.pyplot as plt

    rf = np.asarray(rf)
    if ax is None:
        _, ax = plt.subplots()
    h = ax.hist2d(rf[0] * 1e3, rf[2] * 1e3, bins=(nbins, nbins))
    ax.set_xlabel("x (mm)")
    ax.set_ylabel("y (mm)")
    return h


def heat_plot(H, extent: Tuple[float, float, float, float] | None = None,
              ax=None, **imshow_kwargs):
    """imshow wrapper for detector images (reference utils.py:233-247)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    return ax.imshow(np.asarray(H), interpolation="nearest", origin="lower",
                     extent=extent, **imshow_kwargs)
