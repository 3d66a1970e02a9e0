"""Parallelisation guide: the TPU-native version of the reference's
MPI/multiprocessing tutorial (examples/UROP_examples/manuals/
parallelisation.py == example_ParallelisationGuide.py).

Where the reference teaches mpi4py broadcast/reduce and multiprocessing
BaseManager proxies, everything here is one device mesh:

1. rays sharded over a 'rays' axis (was: MPI rank bundles),
2. the field replicated (was: comm.bcast of a pickled domain per chunk),
3. the detector reduced with an in-graph psum (was: comm.reduce(H, SUM)),
4. chunked accumulation with checkpoint/resume (was: Np_ray_split loops).

Runs on any device count — including a CPU-simulated mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/parallelisation_guide.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from synthpy_tpu import pipeline
    from synthpy_tpu.campaign import run_campaign
    from synthpy_tpu.fields import ScalarDomain, build_pack
    from synthpy_tpu.parallel import ray_mesh, replicate, shard_rays
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    domain = ScalarDomain(2 * ext, 64).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(domain)

    # --- 1+2+3: sharded single-shot run -------------------------------
    mesh = ray_mesh()
    print(f"mesh: {mesh.shape} over {len(mesh.devices.ravel())} devices")
    s0 = init_beam(jax.random.PRNGKey(0), 80_000, 2e-3, 0.0, ext, "circular")
    s_sh = shard_rays(jnp.asarray(s0).T, mesh).T  # rows split over 'rays'
    # pipeline.run is one jitted program; GSPMD partitions the trace over
    # the ray axis and assembles the histogram with an AllReduce.
    H = pipeline.run(domain, s_sh, pack=pack, bins=(108, 80))
    print("sharded shadowgram sum:", float(np.asarray(H).sum()))

    # --- 4: chunked campaign with checkpoint/resume --------------------
    def chunk(key, k):
        s = init_beam(key, 20_000, 2e-3, 0.0, ext, "circular")
        return {"shadow": pipeline.run(domain, s, pack=pack,
                                       bins=(108, 80))}

    acc = run_campaign(chunk, total_rays=100_000, chunk_rays=20_000,
                       key=jax.random.PRNGKey(7),
                       checkpoint_path="campaign_state.npz", verbose=True)
    print("campaign total:", acc["shadow"].sum())
    os.remove("campaign_state.npz")


if __name__ == "__main__":
    main()
