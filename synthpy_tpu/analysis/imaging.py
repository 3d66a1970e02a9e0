"""Detector-image analysis: compare synthetic and experimental images.

Rebuild of the reference's ``Image`` class (src/utils/imaging.py:7-146):
orientation fixes (rotate/flip), pixel<->mm mapping, origin setting, masked
plotting, and line profiles. The reference used scikit-image's
``profile_line``; here profiles are sampled with bilinear interpolation
along the line (scipy-free, numpy-only).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class Image:
    """An experimental or synthetic detector image with physical scaling.

    Args:
        data: 2-D array (rows = y, cols = x).
        mm_per_px: physical pixel pitch. May be a scalar or (x, y) pair.
        origin_px: pixel coordinates of the physical origin (x0, y0);
            defaults to the image centre.
    """

    def __init__(self, data, mm_per_px: float | Tuple[float, float] = 1.0,
                 origin_px: Optional[Tuple[float, float]] = None):
        self.data = np.asarray(data, dtype=np.float64)
        if np.ndim(mm_per_px) == 0:
            mm_per_px = (float(mm_per_px), float(mm_per_px))
        self.mm_per_px = tuple(mm_per_px)
        if origin_px is None:
            origin_px = ((self.data.shape[1] - 1) / 2,
                         (self.data.shape[0] - 1) / 2)
        self.origin_px = tuple(origin_px)

    # -- orientation -----------------------------------------------------

    def rotate90(self, k: int = 1) -> "Image":
        return Image(np.rot90(self.data, k), self.mm_per_px)

    def flip(self, axis: str = "x") -> "Image":
        a = 1 if axis == "x" else 0
        return Image(np.flip(self.data, axis=a), self.mm_per_px,
                     self.origin_px)

    def set_origin(self, x0_px: float, y0_px: float) -> "Image":
        self.origin_px = (x0_px, y0_px)
        return self

    # -- coordinate mapping -----------------------------------------------

    def px_to_mm(self, x_px, y_px):
        return ((np.asarray(x_px) - self.origin_px[0]) * self.mm_per_px[0],
                (np.asarray(y_px) - self.origin_px[1]) * self.mm_per_px[1])

    def mm_to_px(self, x_mm, y_mm):
        return (np.asarray(x_mm) / self.mm_per_px[0] + self.origin_px[0],
                np.asarray(y_mm) / self.mm_per_px[1] + self.origin_px[1])

    @property
    def extent_mm(self):
        """[xmin, xmax, ymin, ymax] for imshow."""
        ny, nx = self.data.shape
        x0, x1 = self.px_to_mm(-0.5, 0)[0], self.px_to_mm(nx - 0.5, 0)[0]
        y0 = self.px_to_mm(0, -0.5)[1]
        y1 = self.px_to_mm(0, ny - 0.5)[1]
        return [float(x0), float(x1), float(y0), float(y1)]

    # -- analysis ----------------------------------------------------------

    def _bilinear(self, xs_px, ys_px):
        ny, nx = self.data.shape
        x = np.clip(xs_px, 0, nx - 1)
        y = np.clip(ys_px, 0, ny - 1)
        i0 = np.clip(np.floor(x).astype(int), 0, nx - 2)
        j0 = np.clip(np.floor(y).astype(int), 0, ny - 2)
        fx, fy = x - i0, y - j0
        d = self.data
        return ((1 - fx) * (1 - fy) * d[j0, i0]
                + fx * (1 - fy) * d[j0, i0 + 1]
                + (1 - fx) * fy * d[j0 + 1, i0]
                + fx * fy * d[j0 + 1, i0 + 1])

    def profile_line(self, start_mm, end_mm, n: int = 200):
        """Intensity profile along a line between two physical points.

        Returns (s_mm, values): distance along the line and the bilinearly
        sampled image values (the role of skimage.profile_line in the
        reference, imaging.py:3,100-146).
        """
        x0, y0 = self.mm_to_px(*start_mm)
        x1, y1 = self.mm_to_px(*end_mm)
        xs = np.linspace(x0, x1, n)
        ys = np.linspace(y0, y1, n)
        vals = self._bilinear(xs, ys)
        length = np.hypot((end_mm[0] - start_mm[0]),
                          (end_mm[1] - start_mm[1]))
        return np.linspace(0.0, length, n), vals

    def normalised(self) -> "Image":
        d = self.data - self.data.min()
        peak = d.max()
        return Image(d / peak if peak > 0 else d, self.mm_per_px,
                     self.origin_px)

    def masked(self, threshold: float) -> np.ma.MaskedArray:
        return np.ma.masked_less(self.data, threshold)

    def plot(self, ax, clim=None, cmap=None, mask_below: float | None = None):
        img = (self.masked(mask_below) if mask_below is not None
               else self.data)
        return ax.imshow(img, origin="lower", extent=self.extent_mm,
                         clim=clim, cmap=cmap, interpolation="nearest")
