"""synthpy_tpu — a TPU-native synthetic laser-diagnostics engine.

From-scratch JAX/XLA rebuild of the capabilities of MAGPIE-ICL/synthPy:
turbulent Gaussian-random-field electron-density generation, 9-component
photon ray tracing through refractive-index gradients, ray-transfer-matrix
optical trains, and synthesis of shadowgraphy, schlieren, refractometry and
interferometry detector images with optional Fresnel (angular-spectrum)
diffraction.

Public API overview:
    fields.ScalarDomain   — gridded scene state (+ analytic test fields)
    fields.grf            — Gaussian random field generators (1/2/3-D)
    tracer.Beam / beam    — ray-bundle initialisation
    tracer.solve*         — ray tracing (RK4 / z-scan / segmented / adaptive)
    optics (diagnostics)  — Shadowgraphy / Schlieren / Refractometry /
                            Interferometry
    pipeline              — fused trace -> optics -> detector programs
    parallel              — device-mesh sharding helpers
    campaign              — chunked runs with checkpoint/resume
    io                    — pvti/vti, npy, FLASH-HDF5, EoS table I/O

Submodules are imported lazily (PEP 562) so that ``synthpy_tpu.config``'s
pre-jax environment bootstrap (``jax_init``) can run before anything
imports jax — the constraint the reference enforces too
(reference config.py:97).
"""

import importlib

__version__ = "0.1.0"

_SUBMODULES = (
    "analysis",
    "campaign",
    "config",
    "constants",
    "fields",
    "io",
    "observe",
    "ops",
    "optics",
    "parallel",
    "pipeline",
    "tracer",
    "utils",
)


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f"synthpy_tpu.{name}")
    raise AttributeError(f"module 'synthpy_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
