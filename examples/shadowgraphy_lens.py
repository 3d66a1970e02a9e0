"""BASELINE config[0]: analytic Gaussian plasma lens -> shadowgraphy.

128^3 grid, 1e5 rays (CPU-runnable; crank -r/-d up on TPU). Mirrors the
reference's canonical single-process run (examples/jobs/run_scripts/
test_SynthRayTrace.py) on the new API.

    python examples/shadowgraphy_lens.py [-d 128] [-r 100000] [-o out.npz]
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
    p.add_argument("-r", type=int, default=100_000)
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.observe import Timer
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    timer = Timer()
    with timer.section("setup"):
        domain = ScalarDomain(2 * ext, args.d).test_lens(ne_0=5e24,
                                                         LR=1.5e-3)
        s0 = init_beam(jax.random.PRNGKey(0), args.r, 2e-3, 0.0, ext,
                       "circular")
    with timer.section("trace+image (incl. compile)"):
        H = pipeline.run(domain, s0, diagnostic="shadowgraphy",
                         bins=(431, 321))
        H.block_until_ready()
    print(timer.report())
    print("image sum:", float(np.asarray(H).sum()), "shape:", H.shape)
    if args.o:
        from synthpy_tpu.io import save_histograms

        save_histograms(args.o, shadowgraphy=np.asarray(H))
        print("saved", args.o)


if __name__ == "__main__":
    main()
