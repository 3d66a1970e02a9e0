"""Solver-equivalence harness: fixed RK4 vs adaptive DP5(4) vs z-scan.

The runnable version of the reference's solve_ivp-vs-diffrax comparison
(examples/jobs/run_scripts/solver_comparisons.py:35-101): identical inputs
through all three integrators, element-wise exit-ray differences, and
timings.

    python examples/solver_comparisons.py [-d 64] [-r 10000]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=64)
    p.add_argument("-r", type=int, default=10_000)
    args = p.parse_args()

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam, solve
    from synthpy_tpu.tracer.adaptive import solve_adaptive
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext = 5e-3
    domain = ScalarDomain(2 * ext, args.d).test_lens(ne_0=5e24, LR=1.5e-3)
    s0 = init_beam(jax.random.PRNGKey(0), args.r, 1.5e-3, 0.0, ext,
                   "circular")

    results = {}
    for name, fn in [
        ("rk4_fixed", lambda: solve(s0, domain, steps_per_cell=2.0)),
        ("rk45_adaptive", lambda: solve_adaptive(s0, domain, rtol=1e-7)),
        ("zscan", lambda: solve_zscan(s0, domain, substeps=2)),
    ]:
        res = fn()
        results[name] = res
        print(f"{name:14s}: {res.duration:8.3f}s")

    ref = np.asarray(results["zscan"].rf)
    for name in ("rk4_fixed", "rk45_adaptive"):
        rf = np.asarray(results[name].rf)
        dpos = np.nanmax(np.abs(rf[0] - ref[0]))
        dth = np.nanmax(np.abs(rf[1] - ref[1]))
        print(f"{name:14s} vs zscan: max |dx| = {dpos:.3e} m, "
              f"max |dtheta| = {dth:.3e} rad")


if __name__ == "__main__":
    main()
