"""Time build_segment_pack_upload at 512^3 full physics, phase by phase."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.fields import ScalarDomain

DIM = int(os.environ.get("DIM", 512))

t0 = time.perf_counter()
from synthpy_tpu.tracer import zscan

dom = ScalarDomain(10e-3, DIM, inv_brems=True, B_on=True, phaseshift=True)
x = np.asarray(dom.x); y = np.asarray(dom.y); z = np.asarray(dom.z)
rng = np.random.default_rng(1)
dom.ne = np.tile(rng.standard_normal((8, DIM, DIM)).astype(np.float32) ** 2
                 * 1e24, (DIM // 8, 1, 1))
dom.Te = np.full((DIM, DIM, DIM), 100.0, np.float32)
dom.Z = np.full((DIM, DIM, DIM), 3.5, np.float32)
dom.B = np.zeros((DIM, DIM, DIM, 3), np.float32)
dom.B[..., 2] = 1.0
t1 = time.perf_counter()
print(f"scene materialise {t1-t0:.1f}s", flush=True)

EXTRAS = os.environ.get("EXTRAS", "f32")
pack = zscan.build_segment_pack_upload(
    dom, K=256, dtype="int4", plane_batch=32, verbose=True,
    extras_dtype=jnp.bfloat16 if EXTRAS == "bf16" else jnp.float32)
jax.block_until_ready(pack.buf if hasattr(pack, "buf") else pack[0])
t2 = time.perf_counter()
nbytes = (DIM**3 * 4 * 6)
print(f"pack build {t2-t1:.1f}s  ({nbytes/2**30:.1f} GB uploaded, "
      f"{nbytes/(t2-t1)/2**30:.2f} GB/s effective)", flush=True)
