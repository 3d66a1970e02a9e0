"""Decompose the upload-builder batch time at 1024-class shapes (r5).

The r4 run measured 1115 s pack_s for 26 GB uploaded (~23 MB/s
effective) while a raw device_put probe reached 0.95 GB/s. Which phase
eats it: host plane-stack, H2D transfer, or the fill program?

Times, per 1024-class batch (PB=32 planes, full physics):
  stack_s    host np.stack of slab+extras from probe-major volumes
  h2d_s      jnp.asarray + block_until_ready for both
  h2d_gbps   effective H2D bandwidth of that transfer
Repeats over several batches; also times a bare repeated device_put of
the SAME host buffer (the r4 probe's configuration) for contrast.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

NA = NB = int(os.environ.get("NA", 1024))
PB = int(os.environ.get("PB", 32))
NEX = int(os.environ.get("NEX", 5))   # Te, Z, Bx, By, Bz
REPS = int(os.environ.get("REPS", 4))

rng = np.random.default_rng(0)
# probe-major volumes, enough planes for REPS batches
n_planes = PB * REPS + 2
ne_h = rng.standard_normal((n_planes, NA, NB), np.float32)
extras_h = [rng.standard_normal((n_planes, NA, NB), np.float32)
            for _ in range(NEX)]

print(f"batch bytes: slab {(PB+2)*NA*NB*4/2**20:.0f} MB + extras "
      f"{NEX*PB*NA*NB*4/2**20:.0f} MB", flush=True)

for rep in range(REPS):
    g0 = rep * PB
    t0 = time.perf_counter()
    slab = np.stack([ne_h[i] for i in range(g0, g0 + PB + 2)])
    ex = np.stack([[e[i] for i in range(g0, g0 + PB)] for e in extras_h])
    t1 = time.perf_counter()
    slab_d = jnp.asarray(slab)
    ex_d = jnp.asarray(ex)
    jax.block_until_ready((slab_d, ex_d))
    t2 = time.perf_counter()
    nbytes = slab.nbytes + ex.nbytes
    print(f"rep {rep}: stack {t1-t0:.2f}s  h2d {t2-t1:.2f}s "
          f"({nbytes/(t2-t1)/2**30:.2f} GB/s)", flush=True)
    del slab_d, ex_d

# contrast: repeated device_put of one contiguous buffer
buf = np.ascontiguousarray(ex[:2])   # ~0.27 GB
for _ in range(3):
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    print(f"bare device_put {buf.nbytes/2**20:.0f} MB: {dt:.2f}s "
          f"({buf.nbytes/dt/2**30:.2f} GB/s)", flush=True)
    del d

# does splitting into per-plane transfers change it?
t0 = time.perf_counter()
ds = [jnp.asarray(ne_h[i]) for i in range(PB)]
jax.block_until_ready(ds)
dt = time.perf_counter() - t0
nb = PB * NA * NB * 4
print(f"per-plane x{PB}: {dt:.2f}s ({nb/dt/2**30:.2f} GB/s)", flush=True)
