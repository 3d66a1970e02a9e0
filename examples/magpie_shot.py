"""BASELINE config[4]: a MAGPIE-shot-scale multi-diagnostic campaign.

Kolmogorov turbulence, 1e8-ray-class bundle traced in checkpointed chunks
through the gather-hoisted segmented tracer, synthesising shadowgraphy +
dark-field schlieren + interferometry from the SAME field. Defaults are
scaled down for a quick run; crank -d/-r up on hardware:

    python examples/magpie_shot.py -d 512 -r 100000000 --chunk 4000000
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", type=int, default=128, help="grid cells per axis")
    p.add_argument("-r", type=float, default=1e6, help="total rays")
    p.add_argument("--chunk", type=float, default=5e5)
    p.add_argument("--ne0", type=float, default=2e25)
    p.add_argument("-o", default="magpie_shot")
    p.add_argument("--checkpoint", default=None,
                   help="resume-able campaign state .npz")
    p.add_argument("--integrator", default="rk2", choices=("rk2", "rk4"),
                   help="slab integrator (rk2 = midpoint production mode)")
    args = p.parse_args()

    from synthpy_tpu import pipeline
    from synthpy_tpu.campaign import run_campaign
    from synthpy_tpu.fields import ScalarDomain, grf
    from synthpy_tpu.io import save_histograms
    from synthpy_tpu.observe import Timer
    from synthpy_tpu.tracer import init_beam

    ext = 1e-3
    timer = Timer()
    with timer.section("field synthesis"):
        coords, field = grf.grf_domain_fft(
            jax.random.PRNGKey(0), grf.kolmogorov, l_max=2 * ext,
            l_min=8 * ext / args.d, extent=ext, res=args.d // 2)
        domain = ScalarDomain(x=coords[0], y=coords[1], z=coords[2])
        domain.external_ne(args.ne0 * (1.0 + 0.5 * field))
        domain.phaseshift = True

    with timer.section("pack build"):
        from synthpy_tpu.tracer.zscan import build_segment_pack_device

        spack = build_segment_pack_device(domain, K=min(64, args.d - 1))

    bins = (431, 321)

    def chunk(key, k):
        s = init_beam(key, int(args.chunk), 0.4 * ext, 0.0, domain.extent,
                      "circular")
        return {
            # one trace, three benches: pipeline.run with a tuple of
            # diagnostics synthesises all detectors from the same exit
            # state (~3x over per-diagnostic re-tracing)
            **pipeline.run(
                domain, s, spack=spack, solver="zscan_seg",
                integrator=args.integrator,
                diagnostic=("shadowgraphy", "schlieren_df",
                            "interferometry"), bins=bins),
        }

    with timer.section("campaign"):
        acc = run_campaign(chunk, total_rays=int(args.r),
                           chunk_rays=int(args.chunk),
                           key=jax.random.PRNGKey(1),
                           checkpoint_path=args.checkpoint, verbose=True)

    save_histograms(args.o, **acc)
    print(timer.report())
    for name, H in acc.items():
        print(f"{name}: sum={H.sum():.3e} max={H.max():.3e}")
    print("saved", args.o + ".npz")


if __name__ == "__main__":
    main()
