"""FLASH HDF5 plotfile reader: electron density on a uniform covering grid.

The reference delegates to yt (handle_filetypes.py:121-150): it derives
n_e = 6.022e23 * dens * ye * sumy  [cm^-3]
(ye = Z/A, sumy = 1/mean molecular mass) and resamples the AMR hierarchy
onto a covering grid at the maximum refinement level. yt is not available
here, so this is a direct h5py implementation of the same operation for
FLASH's paramesh block format: leaf blocks are located via ``node type``,
their physical placement via ``bounding box``, and each leaf is injected
into the covering grid with nearest-neighbour (repeat) upsampling — the
same fill yt's covering_grid performs for coarse-than-target blocks.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

AVOGADRO_PER_MOLE_CC = 6.022e23


def hdf_readin(filename: str, fields=("dens", "ye", "sumy")
               ) -> Tuple[np.ndarray, Tuple[int, ...], np.ndarray]:
    """Read a FLASH plotfile and return (ne, dims, spacing).

    ne is in cm^-3 on a uniform grid covering the whole domain at the
    finest refinement level present.
    """
    import h5py

    with h5py.File(filename, "r") as f:
        node_type = np.asarray(f["node type"])          # 1 = leaf
        refine = np.asarray(f["refine level"])
        bbox = np.asarray(f["bounding box"])            # (nb, ndim, 2)
        data = {name: np.asarray(f[name]) for name in fields}

    ndim = bbox.shape[1]
    # FLASH stores block arrays as (nb, nzb, nyb, nxb)
    block_shape = data[fields[0]].shape[1:][::-1]       # -> (nxb, nyb, nzb)
    leaves = np.where(node_type == 1)[0]
    max_level = int(refine[leaves].max())

    dom_lo = bbox[:, :, 0].min(axis=0)
    dom_hi = bbox[:, :, 1].max(axis=0)

    # block counts at the coarsest level along each axis
    widths_l1 = (bbox[refine == refine.min(), :, 1]
                 - bbox[refine == refine.min(), :, 0])
    base_w = widths_l1.min(axis=0) * (2.0 ** (refine.min() - 1))
    nblocks_base = np.rint((dom_hi - dom_lo) / base_w).astype(int)

    dims = tuple(int(nblocks_base[i] * block_shape[i]
                     * 2 ** (max_level - 1)) for i in range(ndim))
    spacing = (dom_hi - dom_lo) / np.array(dims)

    ne = np.zeros(dims, dtype=np.float64)
    for b in leaves:
        lvl = int(refine[b])
        rep = 2 ** (max_level - lvl)
        # (nzb, nyb, nxb) -> (nxb, nyb, nzb)
        vals = AVOGADRO_PER_MOLE_CC
        for name in fields:
            vals = vals * data[name][b]
        block = np.transpose(vals, tuple(range(ndim))[::-1])
        for ax in range(ndim):
            block = np.repeat(block, rep, axis=ax)
        lo_idx = np.rint((bbox[b, :, 0] - dom_lo) / spacing).astype(int)
        sl = tuple(slice(lo_idx[i], lo_idx[i] + block.shape[i])
                   for i in range(ndim))
        ne[sl] = block
    return ne, dims, spacing


def hdf_to_pvti(hdf_filename: str, pvti_filename: str) -> str:
    """Convert a FLASH plotfile to .pvti (parity:
    handle_filetypes.py:152-162)."""
    from synthpy_tpu.io.vti import export_pvti

    ne, dims, spacing = hdf_readin(hdf_filename)
    ext = [dims[i] * spacing[i] / 2 for i in range(len(dims))]
    return export_pvti(ne, fname=pvti_filename, extent_x=ext[0],
                       extent_y=ext[1], extent_z=ext[2])
