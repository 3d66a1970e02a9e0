"""Runtime configuration: flag registry and pre-import environment bootstrap.

Parity targets in the reference:
  * ``config.flags`` — a key/value registry with update/reset semantics
    (reference src/simulator/config.py:11-71, whose class had two NameError
    bugs we do not reproduce).
  * ``config.jax_init`` — process-global environment setup that must run
    BEFORE jax is imported (reference config.py:73-154): BLAS thread pinning,
    ``--xla_force_host_platform_device_count`` for CPU mesh simulation, and
    optional float64.

On TPU none of the GPU allocator knobs apply; ``jax_init`` keeps only the
pieces that are meaningful for TPU + CPU-simulated meshes.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Any, Dict, Optional


class _ValueHolder:
    """A single registered flag with a default for reset()."""

    __slots__ = ("value", "default")

    def __init__(self, value: Any):
        self.value = value
        self.default = value


class Flags:
    """Key/value flag registry (parity: reference config.py:11-71)."""

    def __init__(self, **defaults: Any):
        self._store: Dict[str, _ValueHolder] = {
            k: _ValueHolder(v) for k, v in defaults.items()
        }

    def register(self, name: str, default: Any) -> None:
        if name in self._store:
            raise KeyError(f"flag {name!r} already registered")
        self._store[name] = _ValueHolder(default)

    def update(self, name: str, value: Any) -> None:
        if name not in self._store:
            raise KeyError(f"unknown flag {name!r}")
        self._store[name].value = value

    def get(self, name: str) -> Any:
        return self._store[name].value

    def __getitem__(self, name: str) -> Any:
        return self.get(name)

    def reset(self, name: str) -> None:
        self._store[name].value = self._store[name].default

    def reset_all(self) -> None:
        for holder in self._store.values():
            holder.value = holder.default

    def as_dict(self) -> Dict[str, Any]:
        return {k: h.value for k, h in self._store.items()}


#: Global flag registry (names follow reference config.py:16-46).
flags = Flags(
    MEMORY_DEBUG=False,
    JITTED=True,
    PARALLELISED=True,
    SEEDED=False,
    JAX_INITIALISED=False,
    X64=False,
)


#: Default persistent-compile-cache directory: per-user (a fixed
#: world-writable /tmp path lets another local user pre-own or poison the
#: cached executables on shared hosts).
DEFAULT_COMPILE_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "synthpy_xla")


def jax_init(
    force_device: Optional[str] = None,
    core_limit: Optional[int] = None,
    x64: bool = False,
    kill_blas_threads: bool = True,
    compilation_cache: Optional[str] = DEFAULT_COMPILE_CACHE,
) -> None:
    """Set process environment for jax BEFORE jax is imported.

    Args:
        force_device: "cpu" or "tpu" (or None to leave platform selection to
            jax). "cpu" with ``core_limit`` N simulates an N-device mesh on
            one host via ``--xla_force_host_platform_device_count`` — the
            pattern the reference used for CPU sharding (config.py:108) and
            which our test suite formalises for TPU-mesh unit tests.
        core_limit: number of fake host devices when force_device == "cpu".
        x64: enable double precision (via JAX_ENABLE_X64 env).
        kill_blas_threads: pin BLAS libraries to one thread each, as the
            reference does (config.py:84-88) — XLA does its own threading.
        compilation_cache: directory for jax's persistent compilation
            cache (None disables). On remote-attached TPU services the
            compile step is the dominant, highly variable cost (measured
            1-300 s for the same program on this host); a warm persistent
            cache turns repeat pack builds into ~1 s.
    """
    assert "jax" not in sys.modules, (
        "jax_init() must be called before jax is imported "
        "(reference config.py:97 enforces the same)"
    )

    if kill_blas_threads:
        for var in (
            "OMP_NUM_THREADS",
            "MKL_NUM_THREADS",
            "OPENBLAS_NUM_THREADS",
            "VECLIB_MAXIMUM_THREADS",
            "NUMEXPR_NUM_THREADS",
        ):
            os.environ.setdefault(var, "1")

    if force_device is not None:
        os.environ["JAX_PLATFORMS"] = force_device
    if force_device == "cpu" and core_limit is not None:
        xla_flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in xla_flags:
            os.environ["XLA_FLAGS"] = (
                xla_flags
                + f" --xla_force_host_platform_device_count={core_limit}"
            ).strip()

    if x64:
        os.environ["JAX_ENABLE_X64"] = "true"
        flags.update("X64", True)

    if compilation_cache:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              compilation_cache)
        # cache every entry, however quick the compile — repeat latency on
        # tunnel-attached chips is dominated by the compile SERVICE, not
        # local compile time
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                              "0")

    flags.update("JAX_INITIALISED", True)


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static configuration of a ray trace (hashable; safe as a jit static).

    Attributes:
        steps_per_cell: RK4 steps per probing-axis cell crossing. The total
            step count is ``ceil(steps_per_cell * sqrt(8) * n_probe)`` which
            mirrors the reference's commented dtmax heuristic of half a cell
            per adaptive step (propagator.py:556).
        dtype: trace dtype; float32 is the TPU-native choice.
        ray_chunk: if set, rays are processed in chunks of this size via
            lax.scan (replaces the reference's Np_ray_split=5e5 loops,
            example_ParallelisationGuide.py:108-126).
    """

    steps_per_cell: float = 1.0
    dtype: str = "float32"
    ray_chunk: Optional[int] = None
