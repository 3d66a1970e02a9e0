"""Propagation-length analysis: image contrast vs probing depth.

The scripted version of the reference's test_PropagationLengthAnalysis
notebook: trace the same turbulent field to increasing depths
(solve_at_depth semantics) and track the shadowgram contrast
(std/mean of the detector image), the standard diagnostic-strength
metric.

    python examples/propagation_length_analysis.py [-d 64] [-r 100000]
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
    p.add_argument("-r", type=int, default=100_000)
    p.add_argument("--depths", type=int, default=5)
    args = p.parse_args()

    from synthpy_tpu.fields import ScalarDomain, grf
    from synthpy_tpu.optics import Shadowgraphy
    from synthpy_tpu.tracer import init_beam

    ext = 1e-3
    key = jax.random.PRNGKey(0)
    coords, field = grf.grf_domain_fft(
        key, grf.kolmogorov, l_max=2 * ext, l_min=4 * ext / (args.d // 2),
        extent=ext, res=args.d // 2)
    domain = ScalarDomain(x=coords[0], y=coords[1], z=coords[2])
    domain.external_ne(2e25 * (1.0 + 0.5 * field))
    domain.calc_dndr(lwl=1064e-9)

    s0 = init_beam(jax.random.PRNGKey(1), args.r, 0.4 * ext, 0.0, ext,
                   "circular")

    from synthpy_tpu.constants import C

    print(f"{'depth [mm]':>12} {'contrast':>10}")
    for frac in np.linspace(0.2, 1.0, args.depths):
        depth = 2 * ext * frac  # path length into the volume
        rf = domain.solve_at_depth(s0, depth=depth, n_steps=96)
        sh = Shadowgraphy(1064e-9, rf)
        sh.two_lens_solve()
        H = np.asarray(sh.histogram(bin_scale=16))
        occupied = H[H > 0]
        contrast = occupied.std() / occupied.mean()
        print(f"{depth * 1e3:12.3f} {contrast:10.4f}")


if __name__ == "__main__":
    main()
