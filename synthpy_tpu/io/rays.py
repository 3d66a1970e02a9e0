"""Ray bundle persistence (.npy) and diagnostic pickles.

Covers the reference's stage-boundary artifact formats: ray dumps
(beam.py:305-321, minimal_solver.py:405-418) and pickled diagnostic objects
(example_ParallelisationGuide.py:134-141). These artifacts are the
checkpoint grain of a long campaign: fields (.pvti), rays (.npy),
histograms (.npz).

Beyond the raw delegates, this module owns the on-disk ray CONTRACT:

* a valid ray dump is (9, Np) full state, (6, Np) minimal state, or
  (4, Np) RTM rays, float32/float64, with finite positions for at least
  one ray (an all-NaN dump means every ray was aperture-killed — almost
  always a unit bug upstream, so loading warns);
* each dump carries a ``<name>.json`` metadata sidecar (state kind, ray
  count, dtype, probing direction, optional user fields) so a campaign
  directory is self-describing without loading the arrays.
"""

from __future__ import annotations

import json
import os
import pickle
import warnings
from typing import Any, Dict, Optional

import numpy as np

#: rows -> state kind, mirroring the reference's three dump shapes
#: (full 9-vector, minimal 6-vector, RTM 4-vector)
STATE_KINDS = {9: "full", 6: "minimal", 4: "rtm"}


def _validate(s: np.ndarray) -> str:
    """Check a ray array against the dump contract; return its kind."""
    if s.ndim != 2:
        raise ValueError(f"ray state must be 2-D (rows, Np); got {s.shape}")
    kind = STATE_KINDS.get(s.shape[0])
    if kind is None:
        # a transposed (Np, rows) array is the most common caller slip
        if s.shape[1] in STATE_KINDS and s.shape[0] not in STATE_KINDS:
            raise ValueError(
                f"ray state {s.shape} looks transposed: expected "
                f"(rows, Np) with rows in {sorted(STATE_KINDS)}")
        raise ValueError(
            f"ray state must have {sorted(STATE_KINDS)} rows; got "
            f"{s.shape[0]}")
    if not np.issubdtype(s.dtype, np.floating):
        raise ValueError(f"ray state must be float; got {s.dtype}")
    return kind


def save_rays(fname: str, s, *, probing_direction: Optional[str] = None,
              meta: Optional[Dict[str, Any]] = None) -> str:
    """Save a (9|6|4, Np) ray state to .npy + a .json metadata sidecar.

    Extra ``meta`` fields are merged into the sidecar verbatim.
    """
    s = np.asarray(s)
    kind = _validate(s)
    if not fname.endswith(".npy"):
        fname += ".npy"
    np.save(fname, s)
    sidecar = {
        "kind": kind,
        "rows": int(s.shape[0]),
        "n_rays": int(s.shape[1]),
        "dtype": str(s.dtype),
    }
    if probing_direction is not None:
        sidecar["probing_direction"] = probing_direction
    if meta:
        sidecar.update(meta)
    with open(fname[:-4] + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    return fname


def load_rays(fname: str, *, validate: bool = True) -> np.ndarray:
    """Load a ray dump, re-checking the contract it was saved under.

    If a metadata sidecar exists, the array is checked against it (shape
    drift between save and load means the file was overwritten by
    something else mid-campaign).
    """
    s = np.load(fname)
    if not validate:
        return s
    _validate(s)
    sidecar = (fname[:-4] if fname.endswith(".npy") else fname) + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        if (meta.get("rows") != s.shape[0]
                or meta.get("n_rays") != s.shape[1]):
            raise ValueError(
                f"{fname}: array shape {s.shape} disagrees with its "
                f"sidecar ({meta.get('rows')}, {meta.get('n_rays')}) — "
                "the dump was modified after it was written")
    # positions are the first rows in every kind; all-non-finite means
    # every ray was filtered (NaN-killed) before the dump
    if s.shape[1] and not np.isfinite(s[0]).any():
        warnings.warn(
            f"{fname}: no ray has a finite position — every ray was "
            "aperture-killed upstream", stacklevel=2)
    return s


def load_ray_meta(fname: str) -> Optional[Dict[str, Any]]:
    """Read a dump's metadata sidecar without loading the array."""
    base = fname[:-4] if fname.endswith(".npy") else fname
    path = base + ".json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_histograms(fname: str, **histograms) -> str:
    """Save named detector images to a compressed .npz."""
    if not fname.endswith(".npz"):
        fname += ".npz"
    np.savez_compressed(fname,
                        **{k: np.asarray(v) for k, v in histograms.items()})
    return fname


def load_histograms(fname: str) -> Dict[str, np.ndarray]:
    with np.load(fname) as data:
        return {k: data[k] for k in data.files}


def save_pickle(fname: str, obj: Any) -> str:
    """Pickle dump (parity with the reference's MPI output format,
    pvti_trace_mpi.py:176-187)."""
    if not fname.endswith(".pkl"):
        fname += ".pkl"
    with open(fname, "wb") as f:
        pickle.dump(obj, f)
    return fname


def load_pickle(fname: str) -> Any:
    with open(fname, "rb") as f:
        return pickle.load(f)
