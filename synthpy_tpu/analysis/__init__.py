"""Post-processing and image analysis."""

from synthpy_tpu.analysis.imaging import Image  # noqa: F401
