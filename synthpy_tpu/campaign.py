"""Chunked mega-run driver with checkpoint/resume.

The reference's production runs loop over Np_ray_split = 5e5 ray chunks,
accumulating detector histograms, with no mid-run persistence — a killed
48-rank MPI job loses everything (example_ParallelisationGuide.py:108-126,
pvti_trace_mpi.py:144-170; SURVEY.md section 5 'checkpoint/resume: none').

``run_campaign`` keeps that chunked structure (each chunk is one fused
trace+image execution, sized to fit HBM) and adds the missing recovery
grain: after every chunk the accumulated histogram(s) and a cursor are
written to an .npz; a restarted campaign resumes from the cursor with
bit-identical results because chunk k's rays derive from fold_in(key, k).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np


def run_campaign(
    chunk_fn: Callable[[jax.Array, int], Dict[str, jax.Array]],
    total_rays: int,
    chunk_rays: int,
    key: jax.Array,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    verbose: bool = False,
    finalize: Optional[Callable[[Dict[str, np.ndarray]],
                                Dict[str, np.ndarray]]] = None,
) -> Dict[str, np.ndarray]:
    """Accumulate per-chunk detector images with optional checkpointing.

    Args:
        chunk_fn: (chunk_key, chunk_index) -> dict of named image arrays.
            Must produce ``chunk_rays`` rays internally from the key (use
            tracer.init_beam with the provided key).
        total_rays: total rays for the campaign.
        chunk_rays: rays per chunk (the Np_ray_split knob).
        key: base PRNG key; chunk k uses fold_in(key, k).
        checkpoint_path: .npz path for resume state (None = no persistence).
        finalize: optional transform applied to the accumulated dict on
            RETURN only (checkpoints keep the raw additive accumulators,
            so resume stays bit-identical). The intended use is exact
            coherent campaigns: have chunk_fn run
            ``pipeline.run(..., coherent_raw=True)`` and pass
            ``lambda acc: {k: pipeline.finalize_coherent(v, name_of[k])
            for k, v in acc.items()}`` — per-chunk field sums then add
            exactly and the image is formed once, retaining cross-chunk
            interference (the reference's MPI reduce drops it,
            interference_MPI.py:190-204).

    Returns:
        dict of accumulated images (numpy arrays).
    """
    n_chunks = -(-total_rays // chunk_rays)
    start_chunk = 0
    acc: Dict[str, np.ndarray] = {}

    if checkpoint_path and os.path.exists(checkpoint_path):
        with np.load(checkpoint_path, allow_pickle=False) as ck:
            meta = json.loads(str(ck["_meta"]))
            if (meta["total_rays"] == total_rays
                    and meta["chunk_rays"] == chunk_rays):
                start_chunk = meta["next_chunk"]
                acc = {k: ck[k] for k in ck.files if k != "_meta"}
                if verbose:
                    print(f"resuming at chunk {start_chunk}/{n_chunks}")

    for k in range(start_chunk, n_chunks):
        chunk_key = jax.random.fold_in(key, k)
        images = chunk_fn(chunk_key, k)
        for name, img in images.items():
            img = np.asarray(img)
            acc[name] = acc.get(name, 0) + img
        if checkpoint_path and ((k + 1) % checkpoint_every == 0
                                or k == n_chunks - 1):
            meta = json.dumps({"total_rays": total_rays,
                               "chunk_rays": chunk_rays,
                               "next_chunk": k + 1})
            tmp = checkpoint_path + ".tmp.npz"
            np.savez_compressed(tmp, _meta=meta, **acc)
            os.replace(tmp, checkpoint_path)
        if verbose:
            print(f"chunk {k + 1}/{n_chunks} done")
    if finalize is not None:
        acc = finalize(acc)
    return acc
