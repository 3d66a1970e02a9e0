"""Decompose build_segment_pack_upload's effective ~45 MB/s (VERDICT r4 #2).

Phases measured independently at DIM^3 (default 512, full physics ne+Te+Z+B):
  A. host probe-major staging (the _pm copies)
  B. raw H2D of one plane-batch-sized contiguous block, repeated — the
     tunnel's large-transfer rate (the 0.95 GB/s probe used one shot;
     maybe big/pipelined transfers behave differently)
  C. B + the fill dispatch chained (the builder's actual inner loop)
  D. the real build_segment_pack_upload wall
Prints one JSON line per phase.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

DIM = int(os.environ.get("DIM", 512))
PB = int(os.environ.get("PB", 32))
K = int(os.environ.get("K", 256))
DT = os.environ.get("DT", "int4")

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer.zscan import build_segment_pack_upload

ext = 5e-3
rng = np.random.default_rng(0)
print(f"building {DIM}^3 host volumes...", flush=True)
t0 = time.perf_counter()
ne = (1e24 * np.exp(-np.linspace(-1, 1, DIM)[:, None, None] ** 2)
      * np.ones((1, DIM, DIM))).astype(np.float32)
Te = np.full((DIM,) * 3, 100.0, np.float32)
Z = np.full((DIM,) * 3, 3.5, np.float32)
B = np.zeros((DIM, DIM, DIM, 3), np.float32)
B[..., 2] = 1.0
print(f"  host volumes {time.perf_counter() - t0:.1f}s", flush=True)

dom = ScalarDomain(2 * ext, DIM, inv_brems=True, phaseshift=True)
dom.external_ne(ne, host=True)
dom.external_Te(Te, host=True)
dom.external_Z(Z, host=True)
dom.external_B(B, host=True)

vol_bytes = 6 * DIM**3 * 4  # six f32 volumes cross per full build

# --- A: staging ------------------------------------------------------------
t0 = time.perf_counter()
ne_pm = np.ascontiguousarray(np.moveaxis(ne, 2, 0))
a_s = time.perf_counter() - t0
print(json.dumps({"phase": "A_stage_one_vol", "s": round(a_s, 2),
                  "GBps": round(ne.nbytes / a_s / 1e9, 2)}), flush=True)

# --- B: raw H2D of plane batches ------------------------------------------
blk = np.ascontiguousarray(ne_pm[:PB + 2])          # (PB+2, DIM, DIM)
for trial in range(2):
    t0 = time.perf_counter()
    n_rep = max(DIM // PB, 4)
    for i in range(n_rep):
        x = jnp.asarray(blk)
        x.block_until_ready()
    b_s = time.perf_counter() - t0
    print(json.dumps({"phase": f"B_h2d_batches_t{trial}",
                      "bytes": blk.nbytes * n_rep, "s": round(b_s, 2),
                      "GBps": round(blk.nbytes * n_rep / b_s / 1e9, 3)}),
          flush=True)

# single big transfer (one volume at once)
t0 = time.perf_counter()
x = jnp.asarray(ne_pm)
x.block_until_ready()
s = time.perf_counter() - t0
print(json.dumps({"phase": "B_h2d_one_volume", "bytes": ne_pm.nbytes,
                  "s": round(s, 2),
                  "GBps": round(ne_pm.nbytes / s / 1e9, 3)}), flush=True)
del x

# async pipelining: enqueue all batches, block at the end
t0 = time.perf_counter()
xs = [jnp.asarray(blk) for _ in range(n_rep)]
for x in xs:
    x.block_until_ready()
s = time.perf_counter() - t0
print(json.dumps({"phase": "B_h2d_enqueue_all", "bytes": blk.nbytes * n_rep,
                  "s": round(s, 2),
                  "GBps": round(blk.nbytes * n_rep / s / 1e9, 3)}),
      flush=True)
del xs

# --- D: the real builder ---------------------------------------------------
t0 = time.perf_counter()
sp = build_segment_pack_upload(dom, K=K, dtype=DT, plane_batch=PB,
                               verbose=os.environ.get("V", "0") == "1")
jax.block_until_ready(sp.seg_planes)
d_s = time.perf_counter() - t0
print(json.dumps({"phase": "D_full_build", "s": round(d_s, 2),
                  "upload_bytes": vol_bytes,
                  "eff_GBps": round(vol_bytes / d_s / 1e9, 3),
                  "pack_gb": round(sp.seg_planes.nbytes / 2**30, 2)}),
      flush=True)
