"""Turbulence recovery with a GRF-SPECTRUM prior vs plain TV.

The round-3+ priors demo (ROADMAP "priors beyond TV"): recover a
band-limited Kolmogorov turbulent column map from a single noisy
shadowgram, comparing two regularisations on the identical data term:

* ``tv``    — pixel-space total variation on the map (the prior the
  joint demo uses); fights the turbulence's own small scales.
* ``grf``   — :func:`synthpy_tpu.priors.make_grf_whitener`: the unknown
  is reparameterised as colorize(theta) with the TRUE spectrum slope
  (known in experiments from inertial-range theory), and the prior is
  the exact white-space Gaussian log-density (white_l2). Every k-mode
  gets unit prior curvature, so descent is preconditioned and the
  unsampled/noise-dominated modes relax to the spectrum instead of to
  piecewise-constant TV plateaus.

Both run the full differentiable production chain (pack -> segmented
march with remat -> ABCD optics -> CIC detector, inverse.make_renderer).

Usage: python examples/inverse_turbulence_grf_prior.py [dim] [rays] [iters]
(CPU smoke test: dim=32 rays=20000 iters=30 runs in ~2 min.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(globals().get("__file__",
                                                  "examples/x.py"))), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.fields.grf import kolmogorov
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.priors import make_grf_whitener, tv, white_l2
from synthpy_tpu.tracer import init_beam

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "examples/x.py"))))

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
RAYS = int(float(sys.argv[2])) if len(sys.argv) > 2 else 200_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 150

EXT = 5e-3
NE_SCALE = 2e24
BEAM_R = 4.0e-3
BINS = (96, 96)
LXY = 10.0
NOISE = 0.02           # multiplicative detector noise (2%)
L_MAX = 6e-3           # injection scale
L_MIN = 1.2e-3         # dissipation-scale cutoff (resolvable at DIM>=32)


def main():
    key = jax.random.PRNGKey(0)
    dom = ScalarDomain(2 * EXT, DIM)

    # true field: unit-variance band-limited Kolmogorov column map
    colorize, _ = make_grf_whitener((DIM, DIM), 2 * EXT / DIM, kolmogorov,
                                    l_max=L_MAX, l_min=L_MIN)
    th_true = jax.random.normal(jax.random.fold_in(key, 7), (DIM, DIM))
    g_true = colorize(th_true)
    z_env = np.exp(-(np.asarray(dom.z)[None, None, :] ** 2) / (2.5e-3) ** 2)

    def volume(g):
        return NE_SCALE * (1.0 + 0.5 * g[:, :, None]) * z_env

    dom.external_ne(volume(g_true))
    s0 = init_beam(jax.random.fold_in(key, 1), RAYS, BEAM_R, 0.0, EXT,
                   "circular")
    render = make_renderer(dom, s0, diagnostic="shadowgraphy", bins=BINS,
                           K=max(DIM // 8, 8), Lx=LXY, Ly=LXY)
    forward = jax.jit(lambda g: render(volume(g)))

    tgt = np.asarray(forward(g_true))
    rng = np.random.default_rng(3)
    tgt_noisy = jnp.asarray(tgt * (1.0 + NOISE * rng.standard_normal(
        tgt.shape)))
    sc = float(np.abs(tgt).max()) + 1e-30

    def data_term(g):
        return jnp.mean(((forward(g) - tgt_noisy) / sc) ** 2)

    def fit(loss_fn, theta0, lr=3e-2):
        opt = optax.adam(optax.cosine_decay_schedule(lr, ITERS))
        state = opt.init(theta0)

        @jax.jit
        def step(th, st):
            l, grads = jax.value_and_grad(loss_fn)(th)
            upd, st = opt.update(grads, st)
            return optax.apply_updates(th, upd), st, l

        th = theta0
        t0 = time.time()
        for i in range(ITERS):
            th, state, l = step(th, state)
            if i % max(ITERS // 5, 1) == 0:
                print(f"  iter {i:4d}  loss {float(l):.6f}", flush=True)
        jax.block_until_ready(th)
        return th, time.time() - t0

    def rel_l2(g):
        return float(np.linalg.norm(np.asarray(g) - np.asarray(g_true))
                     / np.linalg.norm(np.asarray(g_true)))

    print("TV prior:", flush=True)
    th_tv, wall_tv = fit(lambda g: data_term(g) + 3e-3 * tv(g),
                         jnp.zeros((DIM, DIM)))
    err_tv = rel_l2(th_tv)

    print("GRF-spectrum prior (whitened):", flush=True)
    # prior weight ~ 1/SNR^2 of the white-space posterior; 3e-3 keeps the
    # prior from flattening data-constrained modes at this noise level
    th_grf, wall_grf = fit(
        lambda th: data_term(colorize(th)) + 3e-3 * white_l2(th),
        jnp.zeros((DIM, DIM)), lr=2e-1)
    err_grf = rel_l2(colorize(th_grf))

    rec = {"dim": DIM, "rays": RAYS, "iters": ITERS, "noise": NOISE,
           "rel_l2_tv": round(err_tv, 4),
           "rel_l2_grf": round(err_grf, 4),
           "wall_s_tv": round(wall_tv, 1),
           "wall_s_grf": round(wall_grf, 1),
           "backend": jax.default_backend()}
    print(json.dumps(rec))
    with open(os.path.join(_ROOT, "scratch",
                           "results_grf_prior.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
