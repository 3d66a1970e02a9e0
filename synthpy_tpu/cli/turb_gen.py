"""CLI turbulent-field generator (parity: examples/jobs/run_scripts/
turb_gen.py:19-129).

Usage:
    python -m synthpy_tpu.cli.turb_gen -p 3.6667 -e 1e-3 -r 64 \
        [--l-max 2e-3] [--l-min 1e-4] [--factor 1] [-o out_prefix]
        [--ne0 1e25] [--amplitude 9e24] [--seed 0]

Generates a band-limited power-law GRF on device, optionally scales it
into an electron-density field ne0 + amplitude * f, and exports .vti/.pvti.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-p", "--power", type=float, default=11.0 / 3.0,
                   help="spectral index: E(k) ~ k^-p")
    p.add_argument("-e", "--extent", type=float, default=1e-3,
                   help="half-extent [m]")
    p.add_argument("-r", "--res", type=int, default=64,
                   help="cells from 0 to extent (grid = 2*res per axis)")
    p.add_argument("--l-max", type=float, default=None,
                   help="max length scale (default 2*extent)")
    p.add_argument("--l-min", type=float, default=None,
                   help="min length scale (default extent/res*4)")
    p.add_argument("--factor", type=float, default=1.0,
                   help="z-axis stretch factor")
    p.add_argument("--ne0", type=float, default=None,
                   help="mean density; output = ne0 + amplitude*f [m^-3]")
    p.add_argument("--amplitude", type=float, default=None)
    p.add_argument("--method", default="domain_fft",
                   choices=("domain_fft", "fft", "cos"))
    p.add_argument("--nmodes", type=int, default=100,
                   help="mode count for the cos method")
    p.add_argument("-o", "--output", default="turb_field")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--spectrum-check", action="store_true",
                   help="fit and report the realised spectral slope")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from synthpy_tpu.fields import grf
    from synthpy_tpu.fields.spectrum import (
        fit_spectral_slope,
        radial_spectrum,
    )
    from synthpy_tpu.io import export_scalar_field

    key = jax.random.PRNGKey(args.seed)
    k_func = grf.power_law(args.power)
    l_max = args.l_max or 2 * args.extent
    l_min = args.l_min or 4 * args.extent / args.res

    if args.method == "domain_fft":
        coords, field = grf.grf_domain_fft(
            key, k_func, l_max, l_min, args.extent, args.res,
            factor=args.factor)
    elif args.method == "fft":
        field = grf.grf_fft(key, args.res, k_func)
        coords = tuple(
            jax.numpy.linspace(-args.extent, args.extent, s)
            for s in field.shape)
    else:
        n = 2 * args.res
        coords, field = grf.grf_cos_3d(
            key, k_func, 2 * args.extent, 2 * args.extent,
            2 * args.extent * args.factor, n, n, int(n * args.factor),
            args.nmodes, wn1=2 * np.pi / l_max)

    out_field = field
    if args.ne0 is not None:
        amp = args.amplitude if args.amplitude is not None else 0.9 * args.ne0
        out_field = args.ne0 + amp * field

    pvti = export_scalar_field(out_field, coords, fname=args.output)

    summary = {"output": pvti, "shape": list(np.shape(field)),
               "power": args.power}
    if args.spectrum_check:
        k, E, cnt = radial_spectrum(field, 2 * args.extent, nbins=48,
                                    log_bins=True)
        slope = fit_spectral_slope(
            k, E, cnt, 2 * np.pi / l_max * 1.5, 2 * np.pi / l_min * 0.7)
        summary["fitted_slope"] = round(slope, 3)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
