"""Compile-time isolation: which tracer component blows up compilation."""
import sys, os; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
from synthpy_tpu.fields import ScalarDomain, build_pack, layout_of
from synthpy_tpu.tracer import init_beam, trace_rk4
from synthpy_tpu.tracer.zscan import make_zscan_pack, trace_zscan

ext = 5e-3
N = 100_000
for dim in (64, 128):
    d = ScalarDomain(2*ext, dim).test_lens(ne_0=5e24, LR=1.5e-3)
    pack = build_pack(d); layout = layout_of(d)
    s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, ext, 'circular')
    s = jnp.asarray(s0).T
    dt = jnp.float32(1e-13)

    t0 = time.perf_counter()
    out = trace_rk4(s, pack.channels, pack.origin, pack.inv_spacing, dt,
                    layout=layout, n_steps=16)
    out.block_until_ready()
    print(f"dim={dim} trace_rk4 n16 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = trace_rk4(s, pack.channels, pack.origin, pack.inv_spacing, dt,
                    layout=layout, n_steps=16)
    out.block_until_ready()
    print(f"   run: {time.perf_counter()-t0:.3f}s", flush=True)

    zp = make_zscan_pack(pack, layout)
    u = jnp.stack([s0[0], s0[1], s0[3], s0[4], s0[5], s0[6], s0[7], s0[8]], axis=1)
    dp = jnp.float32(zp.dp)
    t0 = time.perf_counter()
    out = trace_zscan(u, zp.planes, zp.origin_ab, zp.inv_spacing_ab, dp,
                      layout=layout, n_slabs=dim-1, substeps=1)
    out.block_until_ready()
    print(f"dim={dim} trace_zscan compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = trace_zscan(u, zp.planes, zp.origin_ab, zp.inv_spacing_ab, dp,
                      layout=layout, n_slabs=dim-1, substeps=1)
    out.block_until_ready()
    print(f"   run: {time.perf_counter()-t0:.3f}s -> {N*(dim-1)/(time.perf_counter()-t0)/1e6:.0f} M ray-steps/s", flush=True)
