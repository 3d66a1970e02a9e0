"""synthpy_tpu — a TPU-native synthetic laser-diagnostics engine.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
MAGPIE-ICL/synthPy: turbulent Gaussian-random-field electron-density
generation, 9-component photon ray tracing through refractive-index
gradients, ray-transfer-matrix optical trains, and synthesis of
shadowgraphy, schlieren, refractometry and interferometry detector images
with optional Fresnel (angular-spectrum) diffraction.

Public API overview:
    fields.ScalarDomain   — gridded scene state (+ analytic test fields)
    fields.grf            — Gaussian random field generators (1/2/3-D)
    tracer.Beam / beam    — ray-bundle initialisation
    tracer.solve          — ray trace through a domain
    optics (diagnostics)  — Shadowgraphy / Schlieren / Refractometry /
                            Interferometry
    parallel              — device-mesh sharding helpers
    io                    — pvti/vti, npy, FLASH-HDF5, EOS table I/O
"""

__version__ = "0.1.0"

from synthpy_tpu import config, constants, utils  # noqa: F401
