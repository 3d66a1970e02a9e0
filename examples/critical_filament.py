"""Mixed-bundle shadowgraphy of a field with an overcritical filament.

An overcritical plasma column (ne > nc: the probe cannot penetrate;
rays reflect at the critical surface) embedded in an underdense
background. `pipeline.run_split` routes only the rays whose probing
column reaches critical density onto the general time-domain tracer
(which reflects them physically); the rest take the fast z-scan path.
The reference has no overcritical handling at all.

    python examples/critical_filament.py [-d 128] [-r 1000000]
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
    p.add_argument("-r", type=int, default=1_000_000)
    p.add_argument("--peak", type=float, default=2.0,
                   help="filament peak in units of nc")
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu import constants, pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam

    ext = 5e-3
    nc = float(constants.critical_density(
        constants.omega_from_lwl(1064e-9)))
    d = ScalarDomain(2 * ext, args.d)
    x = np.asarray(d.x)
    X, Y = np.meshgrid(x, x, indexing="ij")
    r2 = X**2 + Y**2
    prof = (args.peak * nc * np.exp(-r2 / (0.6e-3) ** 2)    # filament
            + 5e24 * np.exp(-r2 / (2e-3) ** 2))             # background
    d.external_ne(np.broadcast_to(prof[:, :, None],
                                  (args.d,) * 3).copy())

    s0 = init_beam(jax.random.PRNGKey(0), args.r, 3e-3, 0.0, ext,
                   "circular")
    H = np.asarray(pipeline.run_split(d, s0, bins=(431, 321)))
    print(f"image sum {H.sum():.3e} of {args.r} rays (missing rays were "
          "reflected at the critical surface or refracted past the "
          "detector edge)")
    print(f"min/max {H.min():.1f}/{H.max():.1f}")
    if args.o:
        from synthpy_tpu.io import save_histograms

        save_histograms(args.o, shadowgraphy=H)
        print("saved", args.o + ".npz")


if __name__ == "__main__":
    main()
