"""MAGPIE integral-quantities ASCII reader.

Rebuild of src/utils/integral_quantities.py:3-41: a '#'-prefixed header line
carries column names (with units in brackets stripped), followed by
whitespace-separated numeric rows; returns a structured numpy array keyed
by the header names.
"""

from __future__ import annotations

import numpy as np


def read_integral_quantities(file_path: str) -> np.ndarray:
    """Read the file into a structured array with named columns."""
    with open(file_path, "r") as f:
        header_line = f.readline().strip().split()
    column_names = [h.replace("#", "").split("[")[0].strip()
                    for h in header_line if h]
    column_names = [c for c in column_names if c]
    return np.genfromtxt(file_path, names=column_names, dtype=None,
                         encoding="utf-8")


# reference-compatible alias
read = read_integral_quantities
