"""Device-memory profile post-processing (pprof .prof summariser).

TPU-native replacement for the reference's memory_plots.py
(evaluation/memory_benchmarks/memory_plots.py:1-84), which shells out to
a Go pprof binary to read the total of each
``memory-domain{D}_rays{R}-<ts>.prof`` dump and scatter-plots memory vs
domain vs rays. Here the gzipped pprof protobuf is parsed directly (a
~60-line varint walk over the two message fields we need), so no external
binary is required.

pprof profile.proto field numbers used:
  Profile: 1 = sample_type (ValueType), 2 = sample (Sample),
           6 = string_table (repeated string)
  ValueType: 1 = type (string index), 2 = unit (string index)
  Sample: 2 = value (repeated int64; packed)
"""

from __future__ import annotations

import gzip
import os
import re
from typing import Dict, List, Optional, Tuple

# the reference's artifact naming (memory_plots.py:6)
FILENAME_PATTERN = re.compile(
    r"memory-domain(\d+)_rays(\d+)-\d{8}-\d{6}\.prof")


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value_bytes_or_int) of one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(buf: bytes) -> List[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def parse_prof(path: str) -> Dict:
    """Parse a pprof .prof dump into sample-type totals.

    Returns {"sample_types": [(type, unit), ...],
             "totals": {type: summed value}, "n_samples": int}.
    For jax device-memory profiles the interesting entry is
    ``totals["space"]`` in bytes.
    """
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)

    strings: List[bytes] = []
    vtypes: List[Tuple[int, int]] = []
    sample_values: List[List[int]] = []
    for field, wire, val in _fields(raw):
        if field == 6 and wire == 2:
            strings.append(val)
        elif field == 1 and wire == 2:  # ValueType
            t = u = 0
            for f2, w2, v2 in _fields(val):
                if f2 == 1:
                    t = v2
                elif f2 == 2:
                    u = v2
            vtypes.append((t, u))
        elif field == 2 and wire == 2:  # Sample
            # Sample.value is repeated int64: writers may emit it PACKED
            # (one length-delimited blob) or as one varint per entry —
            # accumulate into a single per-sample list either way, so
            # zip(sample_types, values) pairs stay aligned.
            vals = []
            for f2, w2, v2 in _fields(val):
                if f2 == 2:
                    vals.extend(_packed_varints(v2) if w2 == 2 else [v2])
            sample_values.append(vals)

    def s(i: int) -> str:
        return strings[i].decode() if i < len(strings) else str(i)

    names = [(s(t), s(u)) for t, u in vtypes]
    totals = {name: 0 for name, _ in names}
    for vals in sample_values:
        for (name, _), v in zip(names, vals):
            # pprof encodes int64 two's-complement in a varint
            if v >= 1 << 63:
                v -= 1 << 64
            totals[name] += v
    return {"sample_types": names, "totals": totals,
            "n_samples": len(sample_values)}


def total_mb(path: str) -> float:
    """Total profiled memory of a device-memory dump in MB (decimal,
    matching the reference's convert_to_mb, memory_plots.py:16-24)."""
    info = parse_prof(path)
    for name in ("space", "inuse_space", "bytes"):
        if name in info["totals"]:
            return info["totals"][name] / 1_000_000
    # fall back to the first sample type
    first = info["sample_types"][0][0]
    return info["totals"][first] / 1_000_000


def summarize_dir(directory: str) -> List[Dict]:
    """Scan a directory of reference-named .prof dumps.

    Returns [{"domain": D, "rays": R, "memory_mb": M, "path": p}, ...]
    sorted by (domain, rays) — the data behind the reference's 3-D
    scatter (memory_plots.py:30-69).
    """
    records = []
    for fname in sorted(os.listdir(directory)):
        m = FILENAME_PATTERN.match(fname)
        if not m:
            continue
        path = os.path.join(directory, fname)
        records.append({
            "domain": int(m.group(1)),
            "rays": int(m.group(2)),
            "memory_mb": total_mb(path),
            "path": path,
        })
    records.sort(key=lambda r: (r["domain"], r["rays"]))
    return records


def plot_memory_scaling(records: List[Dict], ax=None):
    """3-D scatter of memory vs domain vs rays (memory_plots.py:73-84)."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    for r in records:
        ax.scatter(r["domain"], r["rays"], r["memory_mb"], marker="o")
    ax.set_xlabel("domain divisions")
    ax.set_ylabel("no. of rays")
    ax.set_zlabel("total memory usage [MB]")
    return ax
