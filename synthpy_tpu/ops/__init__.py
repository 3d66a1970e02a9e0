"""Compute kernels: interpolation, histograms/deposition, FFT optics."""

from synthpy_tpu.ops.interp import (  # noqa: F401
    grid_geometry,
    regular_grid_interpolator,
    trilinear,
)
from synthpy_tpu.ops.histogram import (  # noqa: F401
    complex_histogram,
    deposit_cic,
    histogram2d,
)
from synthpy_tpu.ops import fresnel, multislice  # noqa: F401
from synthpy_tpu.ops.interp import trilinear_nonuniform  # noqa: F401
