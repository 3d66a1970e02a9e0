"""Ray bundle persistence (.npy) and diagnostic pickles.

Covers the reference's stage-boundary artifact formats: ray dumps
(beam.py:305-321, minimal_solver.py:405-418) and pickled diagnostic objects
(example_ParallelisationGuide.py:134-141). These artifacts are the
checkpoint grain of a long campaign: fields (.pvti), rays (.npy),
histograms (.npz).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import numpy as np


def save_rays(fname: str, s: np.ndarray) -> str:
    """Save a (9, Np) or (4, Np) ray state to .npy."""
    if not fname.endswith(".npy"):
        fname += ".npy"
    np.save(fname, np.asarray(s))
    return fname


def load_rays(fname: str) -> np.ndarray:
    return np.load(fname)


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
