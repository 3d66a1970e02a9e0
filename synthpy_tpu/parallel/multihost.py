"""Multi-host (multi-slice / multi-process) execution helpers.

TPU-native replacement for the reference's mpi4py layer
(example_ParallelisationGuide.py:33-141, pvti_trace_mpi.py:22-187): instead
of rank-parallel processes that pickle-broadcast the field and MPI-reduce
histograms, jax.distributed connects the hosts, each host initialises only
its local shard of the ray bundle, and GSPMD/psum handles every reduction
in-graph over ICI/DCN.

Single-host runs work unchanged (init is a no-op when jax.process_count()
is 1), which is how the unit tests exercise the seed/split logic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the distributed system.

    With no arguments, relies on the TPU environment's auto-bootstrap
    (the moral equivalent of mpiexec's rank wiring, simTraceMPI.sh:14).
    """
    if jax.process_count() > 1:
        return  # already initialised
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process run: nothing to connect
        pass


def local_ray_slice(total_rays: int) -> Tuple[int, int]:
    """(start, count) of this host's share of a global ray bundle.

    The global bundle is floored to a multiple of the process count, like
    the reference floors Np to the core count (propagator.py:504-505).
    """
    n_proc = jax.process_count()
    per_host = total_rays // n_proc
    return jax.process_index() * per_host, per_host


def host_local_beam_key(key: jax.Array) -> jax.Array:
    """Fold the process index into a PRNG key so every host draws a
    distinct, deterministic sub-bundle (replaces per-rank numpy reseeding
    in the MPI scripts)."""
    return jax.random.fold_in(key, jax.process_index())


def global_ray_array(local_rows: jnp.ndarray, mesh) -> jax.Array:
    """Assemble a logically-global (Np, ...) array from per-host local rows
    (jax.make_array_from_process_local_data wrapper)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh, P(mesh.axis_names[0], *([None] * (local_rows.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_rows)
