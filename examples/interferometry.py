"""BASELINE config[2]: Mach-Zehnder interferometry with fringe synthesis.

Phase-integrating trace through a plasma lens, tilted reference beam,
M = 1 telescope with per-element phase propagation, coherent detector
(reference interference_MPI.py workflow on the new API).

    python examples/interferometry.py [-d 128] [-r 500000]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=128)
    p.add_argument("-r", type=int, default=500_000)
    p.add_argument("--n-fringes", type=float, default=10)
    p.add_argument("--deg", type=float, default=20)
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.optics import Interferometry
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext = 5e-3
    domain = ScalarDomain(2 * ext, args.d).test_lens(ne_0=2e25, LR=2e-3)
    domain.phaseshift = True

    s0 = init_beam(jax.random.PRNGKey(0), args.r, 2.5e-3, 0.0, ext,
                   "circular")
    res = solve_zscan(s0, domain, return_E=True)
    print(f"traced {args.r} rays in {res.duration:.3f}s")

    it = Interferometry(1064e-9, res.rf, res.Jf)
    it.two_lens_solve(n_fringes=args.n_fringes, deg=args.deg)
    H = np.asarray(it.interferogram(bin_scale=8))
    bkg = np.asarray(it.bkg(n_fringes=args.n_fringes, deg=args.deg,
                            bin_scale=8))
    print("interferogram max:", H.max(), "bkg max:", bkg.max())
    if args.o:
        from synthpy_tpu.io import save_histograms

        save_histograms(args.o, interferogram=H, background=bkg)


if __name__ == "__main__":
    main()
