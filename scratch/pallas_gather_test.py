"""Feasibility: vectorised gather from a VMEM table inside a Pallas kernel."""
import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

M = 512 * 512
N = 131072  # ray block

def kernel(table_ref, idx_ref, out_ref):
    table = table_ref[:]          # (M,) in VMEM
    idx = idx_ref[:]              # (N,) int32
    out_ref[:] = jnp.take(table, idx, mode='clip')

@jax.jit
def gather_pallas(table, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (M,))
idx = jax.random.randint(key, (N,), 0, M)
try:
    out = gather_pallas(table, idx)
    out.block_until_ready()
    ref = jnp.take(table, idx, mode='clip')
    print("pallas gather works; max err", float(jnp.abs(out-ref).max()), flush=True)
    t0 = time.perf_counter()
    for k in range(20):
        out = gather_pallas(table, idx)
    out.block_until_ready()
    dt = (time.perf_counter()-t0)/20
    print(f"pallas gather: {dt*1e3:.3f} ms for {N} -> {N/dt/1e6:.0f} M/s", flush=True)
except Exception as e:
    print("pallas gather FAILED:", repr(e)[:500], flush=True)

# also test gather inside a fori_loop inside the kernel (the scan analogue)
def kernel2(table_ref, idx_ref, out_ref):
    table = table_ref[:]
    idx = idx_ref[:]
    def body(i, acc):
        return acc + jnp.take(table, idx + i, mode='clip')
    out_ref[:] = jax.lax.fori_loop(0, 8, body, jnp.zeros_like(idx, jnp.float32))

@jax.jit
def gather_loop(table, idx):
    return pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
try:
    out = gather_loop(table, idx); out.block_until_ready()
    t0 = time.perf_counter()
    for k in range(10): out = gather_loop(table, idx)
    out.block_until_ready()
    dt = (time.perf_counter()-t0)/10
    print(f"pallas gather x8-loop: {dt*1e3:.3f} ms -> {8*N/dt/1e6:.0f} M gathers/s", flush=True)
except Exception as e:
    print("pallas loop-gather FAILED:", repr(e)[:500], flush=True)
