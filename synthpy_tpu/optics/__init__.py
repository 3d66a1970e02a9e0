"""Optical trains and synthetic diagnostics."""

from synthpy_tpu.optics.diagnostics import (  # noqa: F401
    Diagnostic,
    Interferometry,
    Polarimetry,
    Refractometry,
    Schlieren,
    Shadowgraphy,
)
from synthpy_tpu.optics import compose, rtm, xray  # noqa: F401
