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
