"""BASELINE config[1]: Kolmogorov GRF turbulence -> dark-field schlieren.

256^3 grid, 1e6 rays by default. On-device field synthesis, trace, and
DF-schlieren with the 1 mm stop (reference diagnostics.py:415-435 geometry).

    python examples/kolmogorov_schlieren.py [-d 128] [-r 200000]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=128, help="res*2 grid cells")
    p.add_argument("-r", type=int, default=200_000)
    p.add_argument("--ne0", type=float, default=1e25)
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain, grf
    from synthpy_tpu.tracer import init_beam

    ext = 1e-3
    key = jax.random.PRNGKey(0)
    coords, field = grf.grf_domain_fft(
        key, grf.kolmogorov, l_max=2 * ext, l_min=4 * ext / (args.d // 2),
        extent=ext, res=args.d // 2)
    domain = ScalarDomain(x=coords[0], y=coords[1], z=coords[2])
    domain.external_ne(args.ne0 + 0.9 * args.ne0 * field)

    s0 = init_beam(jax.random.PRNGKey(1), args.r, 0.4 * ext, 0.0,
                   domain.extent, "circular")
    H = pipeline.run(domain, s0, diagnostic="schlieren_df", bins=(431, 321))
    H = np.asarray(H)
    print("schlieren image: sum", H.sum(), "of", args.r, "rays pass the stop")
    if args.o:
        from synthpy_tpu.io import save_histograms

        save_histograms(args.o, schlieren_df=H)


if __name__ == "__main__":
    main()
