"""BASELINE config[3]: coherent refractogram with Fresnel diffraction.

Phase-integrating trace, imaging refractometer with per-element phase
propagation, plus the full-wave hybrid: deposit exit amplitude/phase on a
grid and angular-spectrum propagate (reference Refractometry.fresnel_solve
+ fresnel_integral.py).

    python examples/coherent_refractogram.py [-d 96] [-r 300000]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=96)
    p.add_argument("-r", type=int, default=300_000)
    p.add_argument("-o", default=None)
    args = p.parse_args()

    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.optics import Refractometry
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import solve_zscan

    ext = 5e-3
    domain = ScalarDomain(2 * ext, args.d).test_lens(ne_0=2e25, LR=2e-3)
    domain.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(0), args.r, 2.5e-3, 0.0, ext,
                   "circular")
    res = solve_zscan(s0, domain, return_E=True)

    # ray-optics coherent refractogram
    rr = Refractometry(1064e-9, res.rf, res.Jf)
    rr.coherent_solve()
    H_ray = np.asarray(rr.refractogram(bin_scale=8))

    # full-wave Fresnel hybrid from the same exit state
    amp = jnp.abs(res.Jf[1])
    phase = res.sf[7]
    grid = jnp.linspace(-3.0, 3.0, 128)  # mm
    rr2 = Refractometry(1064e-9, res.rf, None, x=grid, y=grid,
                        x_l=6e-3, y_l=6e-3, amp=amp, phase=phase)
    H_wave = np.asarray(rr2.fresnel_solve(z=0.3))
    print("refractogram max:", H_ray.max(), "| fresnel intensity max:",
          H_wave.max())
    if args.o:
        from synthpy_tpu.io import save_histograms

        save_histograms(args.o, refractogram=H_ray, fresnel=H_wave)


if __name__ == "__main__":
    main()
