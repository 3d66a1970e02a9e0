"""Subprocess worker for the two-process jax.distributed smoke test.

Run as: python _multihost_worker.py <process_id> <port>
Prints WORKER_OK <pid> on success. Forces the CPU platform before any
backend use (the host may auto-install a TPU plugin at startup).
"""

import os
import sys

os.environ.pop("XLA_FLAGS", None)  # one local CPU device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    from synthpy_tpu.parallel import multihost

    # must be callable BEFORE any backend touch (jax forbids device
    # queries before distributed.initialize on multi-host)
    multihost.initialize(f"localhost:{port}", num_processes=2,
                         process_id=pid)

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    start, count = multihost.local_ray_slice(10)
    assert (start, count) == (5 * pid, 5)

    k = multihost.host_local_beam_key(jax.random.PRNGKey(7))
    # distinct deterministic per-host keys
    assert k.shape == (2,)

    mesh = jax.make_mesh((jax.device_count(),), ("rays",))
    local = jnp.full((4, 3), float(pid + 1), jnp.float32)
    arr = multihost.global_ray_array(local, mesh)
    assert arr.shape == (8, 3)

    # cross-process reduction: 4*3*1 + 4*3*2 = 36
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 36.0, float(total)

    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
