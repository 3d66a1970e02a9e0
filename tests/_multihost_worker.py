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

    # END-TO-END: the one-call pipeline surface over the 2-PROCESS mesh.
    # Each process initialises only ITS slice of the bundle (the
    # reference's per-rank init_beam, pvti_trace_mpi.py:144-163), the
    # trace+detector program runs under GSPMD across processes, and the
    # reduced image equals the single-device run of the full bundle.
    import numpy as np

    from jax.sharding import AxisType

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    dom = ScalarDomain(2 * ext, 16).test_lens(ne_0=5e24, LR=1.5e-3)
    Np = 512
    s_full = np.asarray(init_beam(jax.random.PRNGKey(3), Np, 7e-3, 1e-3,
                                  ext, "circular"))
    ref = np.asarray(pipeline.run(dom, s_full, diagnostic="shadowgraphy",
                                  solver="zscan_seg", seg_K=8,
                                  bins=(24, 18)))

    gmesh = jax.make_mesh((jax.device_count(),), ("rays",),
                          axis_types=(AxisType.Auto,))
    start, count = multihost.local_ray_slice(Np)
    sh = NamedSharding(gmesh, P(None, "rays"))
    s0g = jax.make_array_from_process_local_data(
        sh, s_full[:, start:start + count], (9, Np))
    img = pipeline.run(dom, s0g, diagnostic="shadowgraphy",
                       solver="zscan_seg", seg_K=8, bins=(24, 18),
                       mesh=gmesh)
    # GSPMD may leave the image sharded across processes; a jitted
    # identity with a replicated out sharding is the in-graph all-gather
    img_rep = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(gmesh, P()))(img)
    img_np = np.asarray(img_rep)
    assert img_np.shape == ref.shape, (img_np.shape, ref.shape)
    np.testing.assert_allclose(img_np, ref, rtol=1e-5, atol=1e-5)
    assert float(img_np.sum()) == float(ref.sum()), "ray count not conserved"

    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
