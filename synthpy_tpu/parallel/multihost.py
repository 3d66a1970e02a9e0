"""Multi-host (multi-slice / multi-process) execution helpers.

TPU-native replacement for the reference's mpi4py layer
(example_ParallelisationGuide.py:33-141, pvti_trace_mpi.py:22-187): instead
of rank-parallel processes that pickle-broadcast the field and MPI-reduce
histograms, jax.distributed connects the hosts, each host initialises only
its local shard of the ray bundle, and GSPMD/psum handles every reduction
in-graph over ICI/DCN.

Single-host runs work unchanged (init is a no-op when no distributed
environment is detected), which is how the unit tests exercise the
seed/split logic; tests/test_observe_multihost.py additionally spawns a
real two-process jax.distributed cluster on CPU.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Environment markers that indicate this process is one rank of a
# multi-process job (TPU pod runtime, SLURM, Open MPI / MPICH launchers).
# jax.distributed.initialize() auto-detects the specifics for each.
_DIST_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
    "PMI_SIZE",
)


def _distributed_env_detected() -> bool:
    if any(os.environ.get(v) for v in _DIST_ENV_VARS):
        return True
    # TPU_WORKER_HOSTNAMES with a single entry is a one-worker attachment
    # (e.g. a tunnel-attached single chip), not a multi-process job.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the distributed system.

    With no arguments, relies on the TPU/cluster environment's
    auto-bootstrap (the moral equivalent of mpiexec's rank wiring,
    simTraceMPI.sh:14) and is a no-op when no distributed environment is
    detected. Decision uses ONLY env-var presence — jax forbids touching
    the backend (e.g. jax.process_count()) before
    jax.distributed.initialize() on real multi-host slices, so no jax
    device/process query happens on the path to the initialize call.
    Idempotent: repeated calls return immediately once connected.
    """
    # Detect an existing connection without touching the backend. jax
    # gives no stability guarantee for _src internals, so fall through to
    # the initialize call (whose RuntimeError handler covers the
    # already-connected case) if the private layout ever changes.
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is not None:
                return
        except (ImportError, AttributeError):
            pass
    explicit = coordinator_address is not None
    if not explicit and not _distributed_env_detected():
        return  # single-process run: leave jax untouched
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # ValueError: a cluster marker was present but auto-detection could
        # not resolve a coordinator (e.g. partial env).
        # RuntimeError: the XLA backend was already initialized (jax 0.9
        # raises RuntimeError, not ValueError, for late initialize calls;
        # false-positive markers like SLURM_JOB_NUM_NODES=1 plus any prior
        # jnp op land here). Both cases: stay single-process.
        import warnings

        warnings.warn(
            "distributed env markers present but jax auto-detection "
            "failed; continuing single-process", stacklevel=2)


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
