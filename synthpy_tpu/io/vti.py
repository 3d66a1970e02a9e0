"""VTK XML ImageData (.vti / .pvti) reading and writing — no VTK dependency.

The reference leans on pyvista/vtk for field interchange
(src/utils/handle_filetypes.py:11-119, src/simulator/domain.py:505-579,
src/field_generator/gaussian3D.py:273-357); neither library is available in
a lean TPU image, so this module implements the VTK XML ImageData format
directly:

* writer: cell-data scalar grid -> .vti with raw-appended binary payload
  (optionally zlib-compressed with the standard vtkZLibDataCompressor block
  header) + the hand-written .pvti wrapper the reference emits.
* reader: handles appended raw, appended base64, inline ascii/binary, with
  or without zlib compression; follows .pvti Piece sources; returns the
  Fortran-order-reshaped cell array exactly like the reference's
  pvti_readin (handle_filetypes.py:108-119).
"""

from __future__ import annotations

import base64
import os
import re
import struct
import zlib
from typing import Optional, Sequence, Tuple
from xml.etree import ElementTree as ET

import numpy as np

_DTYPES = {
    "Float32": np.float32,
    "Float64": np.float64,
    "Int32": np.int32,
    "Int64": np.int64,
    "UInt8": np.uint8,
    "UInt32": np.uint32,
    "UInt64": np.uint64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _vtk_compress(raw: bytes, header_dtype=np.uint64,
                  block_size: int = 1 << 15) -> bytes:
    """vtkZLibDataCompressor payload: header + concatenated deflate blocks."""
    nblocks = max((len(raw) + block_size - 1) // block_size, 1)
    last = len(raw) - (nblocks - 1) * block_size
    blocks = [zlib.compress(raw[i * block_size:(i + 1) * block_size])
              for i in range(nblocks)]
    header = np.array([nblocks, block_size, last] +
                      [len(b) for b in blocks], dtype=header_dtype)
    return header.tobytes() + b"".join(blocks)


def _vtk_decompress(payload: bytes, header_dtype=np.uint64) -> bytes:
    itemsize = np.dtype(header_dtype).itemsize
    nblocks, block_size, last = np.frombuffer(payload[:3 * itemsize],
                                              dtype=header_dtype)
    sizes = np.frombuffer(payload[3 * itemsize:(3 + int(nblocks)) * itemsize],
                          dtype=header_dtype)
    off = (3 + int(nblocks)) * itemsize
    out = []
    for s in sizes:
        out.append(zlib.decompress(payload[off:off + int(s)]))
        off += int(s)
    return b"".join(out)


def write_vti(
    fname: str,
    cell_array: np.ndarray,
    spacing: Sequence[float],
    origin: Sequence[float] = (0.0, 0.0, 0.0),
    name: str = "rnec",
    compress: bool = False,
) -> str:
    """Write a (nx, ny, nz) array as CELL data of a .vti ImageData file.

    Grid dimensions are cell counts + 1 like the reference's pyvista export
    (full_solver.py:476-477). Data is stored Fortran-ordered.
    """
    if not fname.endswith(".vti"):
        fname += ".vti"
    arr = np.asarray(cell_array)
    nx, ny, nz = arr.shape
    raw = np.asfortranarray(arr).tobytes(order="F")
    payload = _vtk_compress(raw) if compress else (
        struct.pack("<Q", len(raw)) + raw)
    compressor = (' compressor="vtkZLibDataCompressor"' if compress else "")
    dtype_name = _DTYPE_NAMES[arr.dtype]
    sp = " ".join(repr(float(s)) for s in spacing)
    og = " ".join(repr(float(o)) for o in origin)
    header = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64"{compressor}>
  <ImageData WholeExtent="0 {nx} 0 {ny} 0 {nz}" Origin="{og}" Spacing="{sp}">
    <Piece Extent="0 {nx} 0 {ny} 0 {nz}">
      <CellData Scalars="{name}">
        <DataArray type="{dtype_name}" Name="{name}" format="appended" offset="0"/>
      </CellData>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
_"""
    with open(fname, "wb") as f:
        f.write(header.encode())
        f.write(payload)
        f.write(b"\n  </AppendedData>\n</VTKFile>\n")
    return fname


def write_pvti(fname: str, vti_fname: str, dims: Sequence[int],
               spacing: Sequence[float], name: str = "rnec",
               dtype_name: str = "Float64") -> str:
    """Write the parallel .pvti wrapper pointing at one .vti piece
    (format parity: reference handle_filetypes.py:60-85)."""
    if not fname.endswith(".pvti"):
        fname += ".pvti"
    nx, ny, nz = dims
    rel = os.path.basename(vti_fname)
    sp = " ".join(repr(float(s)) for s in spacing)
    content = f"""<?xml version="1.0"?>
<VTKFile type="PImageData" version="0.1" byte_order="LittleEndian" header_type="UInt32" compressor="vtkZLibDataCompressor">
    <PImageData WholeExtent="0 {nx} 0 {ny} 0 {nz}" GhostLevel="0" Origin="0 0 0" Spacing="{sp}">
        <PCellData Scalars="{name}">
            <PDataArray type="{dtype_name}" Name="{name}">
            </PDataArray>
        </PCellData>
        <Piece Extent="0 {nx} 0 {ny} 0 {nz}" Source="{rel}"/>
    </PImageData>
</VTKFile>"""
    with open(fname, "w") as f:
        f.write(content)
    return fname


def export_scalar_field(field, coords, fname: Optional[str] = None,
                        name: str = "rnec", compress: bool = False) -> str:
    """Export a field + its coordinate vectors as .vti + .pvti.

    Spacing follows the reference convention max(coord)/((n-1)//2)
    (origin-centred grids, full_solver.py:481-484). Returns the .pvti path.
    """
    field = np.asarray(field)
    if fname is None:
        fname = "./plasma_PVTI_export"
    spacing = [float(np.max(np.asarray(c)))
               / max((field.shape[i] - 1) // 2, 1)
               for i, c in enumerate(coords[: field.ndim])]
    while len(spacing) < 3:
        spacing.append(1.0)
    arr3 = field.reshape(field.shape + (1,) * (3 - field.ndim))
    vti = write_vti(fname, arr3, spacing, name=name, compress=compress)
    write_pvti(fname, vti, arr3.shape, spacing, name=name,
               dtype_name=_DTYPE_NAMES[arr3.dtype])
    return fname + ".pvti"


def _read_data_array(elem, root, appended_blob, byte_order, header_dtype,
                     compressed):
    dtype = _DTYPES[elem.get("type")]
    fmt = elem.get("format", "ascii")
    if fmt == "ascii":
        return np.array(elem.text.split(), dtype=dtype)
    if fmt == "appended":
        off = int(elem.get("offset", "0"))
        blob = appended_blob[off:]
    else:  # inline binary (base64)
        blob = base64.b64decode(elem.text.strip())
    itemsize = np.dtype(header_dtype).itemsize
    if compressed:
        raw = _vtk_decompress(blob, header_dtype)
    else:
        (nbytes,) = np.frombuffer(blob[:itemsize], dtype=header_dtype)
        raw = blob[itemsize:itemsize + int(nbytes)]
    return np.frombuffer(raw, dtype=dtype)


def read_vti(fname: str) -> Tuple[np.ndarray, Tuple[int, ...], np.ndarray]:
    """Read the first cell-data array of a .vti file.

    Returns:
        (cells, shape, spacing) with cells reshaped Fortran-order to the
        cell dimensions, matching the reference's pvti_readin
        (handle_filetypes.py:108-119).
    """
    with open(fname, "rb") as f:
        content = f.read()

    # split off appended raw section if present (not valid XML)
    appended_blob = b""
    m = re.search(br'<AppendedData\s+encoding="raw">', content)
    if m:
        start = content.index(b"_", m.end()) + 1
        end = content.rindex(b"</AppendedData>")
        appended_blob = content[start:end]
        xml_text = content[:m.end()] + b"</AppendedData>" + \
            content[end + len(b"</AppendedData>"):]
    else:
        m64 = re.search(br'<AppendedData\s+encoding="base64">', content)
        if m64:
            start = content.index(b"_", m64.end()) + 1
            end = content.rindex(b"</AppendedData>")
            appended_blob = base64.b64decode(content[start:end])
            xml_text = content[:m64.end()] + b"</AppendedData>" + \
                content[end + len(b"</AppendedData>"):]
        else:
            xml_text = content

    root = ET.fromstring(xml_text)
    header_dtype = _DTYPES.get(root.get("header_type", "UInt32"), np.uint32)
    compressed = root.get("compressor") is not None
    byte_order = root.get("byte_order", "LittleEndian")

    image = root.find("ImageData")
    extent = [int(v) for v in image.get("WholeExtent").split()]
    dims = (extent[1] - extent[0], extent[3] - extent[2],
            extent[5] - extent[4])
    spacing = np.array([float(v) for v in image.get("Spacing").split()])

    cell_data = image.find("Piece").find("CellData")
    arr_elem = cell_data.find("DataArray")
    flat = _read_data_array(arr_elem, root, appended_blob, byte_order,
                            header_dtype, compressed)
    n_comp = int(arr_elem.get("NumberOfComponents", "1"))
    shape = list(dims) + ([n_comp] if n_comp > 1 else [])
    cells = flat.reshape(shape, order="F")
    return cells, cells.shape, spacing


def read_pvti(fname: str) -> Tuple[np.ndarray, Tuple[int, ...], np.ndarray]:
    """Read a .pvti by following its (single) Piece source
    (parity surface: reference pvti_readin, handle_filetypes.py:89-119)."""
    root = ET.parse(fname).getroot()
    piece = root.find("PImageData").find("Piece")
    src = piece.get("Source")
    path = os.path.join(os.path.dirname(os.path.abspath(fname)), src)
    return read_vti(path)


# reference-compatible aliases
pvti_readin = read_pvti


def export_pvti(ne, fname: str, extent_x: float, extent_y: float,
                extent_z: float, name: str = "rnec",
                compress: bool = False) -> str:
    """Reference-signature export (handle_filetypes.py:11-87): field +
    half-extents -> .vti/.pvti pair."""
    ne = np.asarray(ne)
    coords = (np.array([extent_x]), np.array([extent_y]),
              np.array([extent_z]))
    return export_scalar_field(ne, coords, fname=fname, name=name,
                               compress=compress)
