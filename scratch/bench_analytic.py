"""Analytic pack-free march throughput on the real chip.

The gridded march is gather-bound; the analytic march has NO gathers —
its stage is pure VPU elementwise math (exp/mul for the lens field plus
the shared RHS). This measures (a) rays/s at the bench configuration
(512-step march, 4M rays, test_lens), (b) integrator/step scaling, and
(c) the 1e8-ray one-shot end-to-end shadowgram with ZERO pack build.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam
from synthpy_tpu import pipeline

EXT = 5e-3
DIM = 512
N = 4_000_000

dom = ScalarDomain(2 * EXT, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), N, 2e-3, 0.0, EXT, "circular")


def timed(fn, reps=3):
    H = fn()
    jax.block_until_ready(H)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        H = fn()
        jax.block_until_ready(H)
        ts.append(time.perf_counter() - t0)
    return H, min(ts)


for integ in ("rk2", "rk4"):
    for n_steps in (512, 256, 128):
        H, el = timed(lambda: pipeline.run(
            dom, s0, solver="analytic", bins=(431, 321),
            integrator=integ, n_steps=n_steps))
        print(json.dumps({
            "what": "analytic_march", "integrator": integ,
            "n_steps": n_steps, "rays": N,
            "rays_per_s": round(N / el, 1),
            "elapsed_s": round(el, 4),
            "checksum": float(jnp.asarray(H).sum())}), flush=True)

# 1e8 one-shot end-to-end: domain + trace + detector, cold wall clock
t0 = time.perf_counter()
d2 = ScalarDomain(2 * EXT, DIM).test_lens(ne_0=5e24, LR=1.5e-3)
key = jax.random.PRNGKey(0)
chunk = 4_000_000
acc = None
for k in range(25):
    s_k = init_beam(jax.random.fold_in(key, k), chunk, 2e-3, 0.0, EXT,
                    "circular")
    Hk = pipeline.run(d2, s_k, solver="analytic", bins=(431, 321),
                      integrator="rk2", n_steps=512, critical_guard=None)
    acc = Hk if acc is None else acc + Hk
acc.block_until_ready()
el = time.perf_counter() - t0
print(json.dumps({"what": "analytic_1e8_end_to_end",
                  "integrator": "rk2", "n_steps": 512,
                  "wall_s": round(el, 2),
                  "checksum": float(jnp.asarray(acc).sum())}), flush=True)


# -- follow-up probes appended after the first run (results in
# scratch/results_analytic_r3.jsonl):
# * step-count convergence vs an rk4/4096-step truth: the lens march is
#   CONVERGED AT 32 STEPS (rel_v_err 5.8e-5 = f32 floor, flat 32..512),
#   while the gridded 512^3 K=dim fast profile sits at 1.7e-2 max rel_v
#   (frozen-corner clamp + interp error) — the analytic tier is both
#   faster and exact.
# * low-step tiers at 4M rays: 64 steps 11.4M rays/s, 32 steps 15.6M.
# * 1e8 one-shot end-to-end (warm compile, like the gridded 1e8 logs):
#   4M chunks 14.3 s, 10M 11.69 s, 20M chunks 9.83 s — ZERO pack build.
#   Cold-compile first-call variance on axon remains 1-500 s (pack
#   window), same as every other path.
