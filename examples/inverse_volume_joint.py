"""Experimental-scale JOINT inversion: a 128^3-class field from 3 benches.

The round-3 flagship inverse demo (ROADMAP round-3 item): recover a
128 x 128 transverse electron-density map, extruded through a known
z-envelope into a full 128^3 volume, from THREE synthetic diagnostics of
the same shot — shadowgraphy, dark-field schlieren and interferometry —
with a joint pixel-space loss plus total-variation regularisation.

Every piece runs the production machinery end-to-end differentiably:

* forward model = pack build -> segmented slab march (segment-granularity
  remat, inverse.py) -> composed ABCD optics (transmission-weighted) ->
  CIC detectors, via make_renderer's multi-diagnostic mode (one trace,
  three benches);
* the interferogram constrains the line-integrated phase (absolute ne),
  shadowgraphy/schlieren constrain transverse gradients — a joint loss
  resolves the scale degeneracy either alone leaves;
* a two-phase CURRICULUM handles the fringe loss's non-convexity: the
  first 60% of steps fit the incoherent benches (smooth in ne), then the
  interferometry term switches on to pin the absolute scale — a raw
  fringe loss at a cold start is trapped by phase wrapping (error >> 2pi);
* TV regularisation (pixel-space prior) fills the beam-unsampled corners.

Measured on one v5e chip (dim=128, 2e5 rays, 200 adam steps):
see scratch/results_inverse_joint_r3.json — the script writes wall time,
peak HBM from jax's allocator, and relative-L2 recovery error inside the
beam-sampled region.

Usage: python examples/inverse_volume_joint.py [dim] [rays] [iters]
(CPU smoke test: dim=33 rays=20000 iters=40 finishes in ~2 min.)
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

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "examples/x.py"))))

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.tracer import init_beam

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
RAYS = int(float(sys.argv[2])) if len(sys.argv) > 2 else 200_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200

EXT = 5e-3
NE_SCALE = 5e24
BENCHES = ("shadowgraphy", "schlieren_df", "interferometry")
BINS = (64, 48)


def main():
    key = jax.random.PRNGKey(0)
    dom = ScalarDomain(2 * EXT, DIM)
    dom.phaseshift = True  # interferometry needs accumulated phase

    # ground truth: two offset Gaussian blobs on a broad pedestal,
    # extruded through a Gaussian z-envelope (the 2.5-D ansatz)
    x = np.asarray(dom.x)[:, None]
    y = np.asarray(dom.y)[None, :]
    g_true = (0.8 * np.exp(-((x - 0.8e-3) ** 2 + y**2) / (1.2e-3) ** 2)
              + 0.6 * np.exp(-((x + 1.0e-3) ** 2 + (y - 0.6e-3) ** 2)
                             / (0.9e-3) ** 2)
              + 0.15 * np.exp(-(x**2 + y**2) / (3.0e-3) ** 2))
    z_env = np.exp(-(np.asarray(dom.z)[None, None, :] ** 2) / (2.5e-3) ** 2)

    def volume(g):
        """(na, nb) map -> (dim, dim, dim) volume via the known envelope."""
        return NE_SCALE * g[:, :, None] * z_env

    dom.external_ne(volume(jnp.asarray(g_true)))

    s0 = init_beam(jax.random.fold_in(key, 1), RAYS, 3.2e-3, 0.0, EXT,
                   "circular")
    render = make_renderer(dom, s0, diagnostic=BENCHES, bins=BINS,
                           K=max(DIM // 8, 8))

    render_v = lambda g: render(volume(g))
    targets = jax.jit(render_v)(jnp.asarray(g_true))
    targets = tuple(jax.lax.stop_gradient(t) for t in targets)
    scales = tuple(float(jnp.abs(t).max()) + 1e-30 for t in targets)

    tv_w = 3e-3
    # per-bench loss weights: (incoherent..., interferometry); the fringe
    # term is gated by the curriculum flag
    coh_idx = BENCHES.index("interferometry")

    def loss_fn(theta, coh_w):
        g = jax.nn.softplus(theta)  # positivity
        imgs = render_v(g)
        data = 0.0
        for j, (im, tg, sc) in enumerate(zip(imgs, targets, scales)):
            w = coh_w if j == coh_idx else 1.0
            data = data + w * jnp.mean(((im - tg) / sc) ** 2)
        tv = (jnp.mean(jnp.abs(jnp.diff(g, axis=0)))
              + jnp.mean(jnp.abs(jnp.diff(g, axis=1))))
        return data + tv_w * tv

    theta = jnp.full((DIM, DIM), -1.5)  # softplus^-1 of ~0.2 pedestal
    opt = optax.adam(3e-2)
    state = opt.init(theta)

    @jax.jit
    def step(th, st, coh_w):
        l, grads = jax.value_and_grad(loss_fn)(th, coh_w)
        upd, st = opt.update(grads, st)
        return optax.apply_updates(th, upd), st, l

    t0 = time.time()
    warm = int(0.6 * ITERS)
    for i in range(ITERS):
        coh_w = jnp.float32(0.0 if i < warm else 1.0)
        theta, state, l = step(theta, state, coh_w)
        if i % max(ITERS // 10, 1) == 0:
            print(f"iter {i:4d}  loss {float(l):.6f}"
                  + ("  [joint]" if i >= warm else "  [incoherent]"),
                  flush=True)
    jax.block_until_ready(theta)
    wall = time.time() - t0

    g_rec = np.asarray(jax.nn.softplus(theta))
    # error metrics inside the beam-sampled disc
    r2 = (x**2 + y**2)
    mask = r2 < (3.2e-3) ** 2
    rel_all = (np.linalg.norm(g_rec - g_true)
               / np.linalg.norm(g_true))
    rel_beam = (np.linalg.norm((g_rec - g_true)[mask])
                / np.linalg.norm(g_true[mask]))

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_hbm = stats.get("peak_bytes_in_use", 0)
    except Exception:
        peak_hbm = 0

    rec = {"dim": DIM, "rays": RAYS, "iters": ITERS,
           "benches": list(BENCHES),
           "wall_s": round(wall, 1),
           "s_per_iter": round(wall / ITERS, 3),
           "rel_l2_full": round(float(rel_all), 4),
           "rel_l2_beam": round(float(rel_beam), 4),
           "peak_hbm_gb": round(peak_hbm / 2**30, 2),
           "backend": jax.default_backend()}
    print(json.dumps(rec))
    out = os.path.join(_ROOT, "scratch",
                       "results_inverse_joint_r3.json")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    np.save(os.path.join(_ROOT, "scratch",
                         "inverse_joint_recovered.npy"), g_rec)


if __name__ == "__main__":
    main()
