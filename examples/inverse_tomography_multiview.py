"""Multi-view TOMOGRAPHIC inversion: a genuinely 3-D field from 2-3 views.

Single-view inversion is ill-posed along the probing axis: a parallel
view's data is (to first order) a projection, so every Fourier mode
with a nonzero wavenumber component along that axis integrates to zero
and the recovery collapses to the beam-integrated 2.5-D field (measured
round 3: rel_l2_beam 0.385 but rel_l2_full 0.87-0.89,
scratch/results_inverse_joint_r3.json). This script closes that gap the
way experiments do — probe the SAME shot from orthogonal directions —
and fits one shared 3-D volume jointly against every view's
diagnostics:

* ground truth: three Gaussian density blobs at distinct 3-D positions
  on a compact pedestal — structure a single view provably cannot
  localise (the z-view phase map of a blob is INDEPENDENT of the blob's
  z position; verified in tests/test_inverse.py::
  test_multiview_sees_probing_axis_structure);
* per view ('z', 'x', 'y'): a circular beam probes along that axis and
  two synthetic measurements are taken — a shadowgram and an
  INTERFEROGRAM, the latter demodulated by the standard experimental
  workflow (Takeda sideband extraction, 2-D unwrap, edge-annulus offset
  rectification, physics sign fix; analysis.fringes) into an absolute
  phase target;
* the unknown volume is parameterised by the GRF-WHITENING prior
  (priors.make_grf_whitener, 3-D): g = softplus(c0 + sig*colorize(th))
  with a standard-normal penalty on the white variable th — exact MAP
  inference under a Gaussian-process prior whose spectrum matches the
  expected smoothness, and self-preconditioning (unit prior curvature
  per mode);
* the joint loss sums every view's cold-start-balanced shadow + phase
  misfits; jax.grad runs through all traces (inverse.make_renderer's
  segment-remat march) at once.

The forward surface is inverse.make_multiview_renderers: one call
builds the renderer per probing direction over copies of the same
domain. The reference cannot express any of this — its trace is not
differentiable (reference full_solver.py:376-403) and its probing
direction is a per-run scalar, never jointly fitted.

Usage: python examples/inverse_tomography_multiview.py \
          [dim] [rays_per_view] [iters] [n_views] [lr]
(CPU smoke: dim=33 rays=20000 iters=30 n_views=2 finishes in ~2 min.)
n_views=1 runs the single-view baseline on the identical truth and
parameterisation — the apples-to-apples comparison for rel_l2_full.
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

from synthpy_tpu.analysis.fringes import (phase_difference,
                                          rectify_phase_offset,
                                          unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_multiview_renderers
from synthpy_tpu.priors import make_grf_whitener, white_l2
from synthpy_tpu.tracer import init_beam

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
RAYS = int(float(sys.argv[2])) if len(sys.argv) > 2 else 400_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
N_VIEWS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
LR = float(sys.argv[5]) if len(sys.argv) > 5 else 3e-2

EXT = 5e-3
NE_SCALE = 5e23        # few-fringe object: demodulable at detector res
BEAM_R = 3.2e-3
BINS = (96, 96)
LXY = 8.0
N_FRINGES = 16.0
VIEWS = ("z", "x", "y")[:N_VIEWS]
# GRF prior: steep enough to favour the blob scale, band wide enough to
# express it; correlation length ~ blob width
# prior std in softplus preimage space: sized so theta needs only ~1
# unit of amplitude to span vacuum -> peak blob density (adam moves
# theta by ~lr per iter, so required amplitude / lr bounds the
# iteration count; SIG=2 measured stalling at the 33^3 smoke scale)
SIG = 4.0
# FIXED softplus offset: theta=0 -> g ~ 0.018, so the unsampled corners
# default to (near) vacuum under the white prior instead of inheriting
# a fitted global pedestal (a learnable offset measured rel_l2_full 6.1
# at the 33^3 smoke scale: the in-beam pedestal dragged every corner up)
C0 = -4.0
W_WHITE = 1e-2


def main():
    key = jax.random.PRNGKey(0)
    dom = ScalarDomain(2 * EXT, DIM, phaseshift=True)

    # ---- ground truth: 3 blobs at distinct 3-D positions ------------
    # compact (inside r ~ 2 mm) so every view's edge annulus sees zero
    # phase and the rectified demodulated targets are absolute
    x = np.asarray(dom.x)[:, None, None]
    y = np.asarray(dom.y)[None, :, None]
    z = np.asarray(dom.z)[None, None, :]
    w2 = (0.8e-3) ** 2
    g_true = (0.8 * np.exp(-((x - 0.9e-3) ** 2 + y**2
                             + (z - 0.7e-3) ** 2) / w2)
              + 0.65 * np.exp(-((x + 0.7e-3) ** 2 + (y - 0.8e-3) ** 2
                                + (z + 0.9e-3) ** 2) / w2)
              + 0.5 * np.exp(-(x**2 + (y + 1.0e-3) ** 2
                               + (z - 0.2e-3) ** 2) / w2)
              + 0.15 * np.exp(-(x**2 + y**2 + z**2) / (1.6e-3) ** 2))
    g_true_j = jnp.asarray(g_true, jnp.float32)

    # ---- per-view beams and renderers --------------------------------
    beams = {v: init_beam(jax.random.fold_in(key, i), RAYS, BEAM_R, 0.0,
                          EXT, "circular", probing_direction=v)
             for i, v in enumerate(VIEWS)}
    pdt = jnp.bfloat16 if DIM >= 256 else None
    common = dict(bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
                  n_fringes=N_FRINGES, pack_dtype=pdt)
    rend_meas = make_multiview_renderers(
        dom, beams, diagnostic=("shadowgraphy", "interferometry"),
        **common)
    rend_model = make_multiview_renderers(
        dom, beams, diagnostic=("shadowgraphy", "phase_map"), **common)

    # ---- synthetic measurements + experimental phase retrieval ------
    ny, nx = BINS[1], BINS[0]
    yy = (np.arange(ny) - ny / 2 + 0.5) / ny * LXY
    xx = (np.arange(nx) - nx / 2 + 0.5) / nx * LXY
    rr = np.hypot(yy[:, None], xx[None, :])
    beam_px = rr < BEAM_R * 1e3 * 0.94
    edge_px = (rr > BEAM_R * 1e3 * 0.81) & (rr < BEAM_R * 1e3 * 0.97)

    # ONE jitted program measures every view (remote-service compiles
    # dominate wall time at small dims — measured ~14 min for the
    # per-view-jit version of this block at 33^3)
    @jax.jit
    def meas_all(g):
        return {v: rend_meas[v](NE_SCALE * g) for v in VIEWS}

    shot = {v: [np.asarray(t) for t in im]
            for v, im in meas_all(g_true_j).items()}
    vac = {v: [np.asarray(t) for t in im]
           for v, im in meas_all(jnp.zeros_like(g_true_j)).items()}

    tgt_shadow, tgt_phase = {}, {}
    for v in VIEWS:
        sh, H_shot = shot[v]
        H_bkg = vac[v][1]
        assert np.abs(sh).max() > 1e-3 and np.abs(H_shot).max() > 1e-3, (
            f"degenerate measurement for view {v!r}")
        pw = phase_difference(jnp.asarray(H_shot), jnp.asarray(H_bkg))
        pu = unwrap_2d(pw, anchor=(ny // 2, nx // 2))
        pu = rectify_phase_offset(pu, edge_px)
        if np.median(pu[beam_px]) > 0:
            pu = -pu  # sideband sign ambiguity; plasma phase < 0
        tgt_shadow[v] = jnp.asarray(sh)
        tgt_phase[v] = jnp.asarray(pu)
    phase_mask = jnp.asarray(beam_px)

    # ---- GRF-whitened volume parameterisation ------------------------
    colorize, n_modes = make_grf_whitener(
        (DIM, DIM, DIM), 2 * EXT / (DIM - 1), lambda k: k ** (-4.0),
        l_max=2 * EXT, l_min=0.5e-3)
    print(f"GRF prior: {n_modes} active modes", flush=True)

    def field(theta):
        return jax.nn.softplus(C0 + SIG * colorize(theta))

    sc_sh = {v: float(np.abs(tgt_shadow[v]).max()) + 1e-30 for v in VIEWS}
    sc_ph = {v: float(np.abs(np.asarray(tgt_phase[v])[beam_px]).max())
             + 1e-30 for v in VIEWS}

    def data_terms(params):
        g = field(params)
        ne = NE_SCALE * g
        out = {}
        for v in VIEWS:
            im_sh, im_ph = rend_model[v](ne)
            l_sh = jnp.mean(((im_sh - tgt_shadow[v]) / sc_sh[v]) ** 2)
            l_ph = (jnp.sum(phase_mask
                            * ((im_ph - tgt_phase[v]) / sc_ph[v]) ** 2)
                    / phase_mask.sum())
            out[v] = (l_sh, l_ph)
        return g, out

    params0 = jnp.zeros((DIM, DIM, DIM), jnp.float32)
    # balance benches by cold-start misfit per view (measured rationale
    # in examples/inverse_volume_joint.py). theta=0 renders (near)
    # vacuum, so the cold-start misfits follow from the already-measured
    # vacuum renders — no extra compiled forward needed (remote-service
    # compiles dominate wall time). FLOORED against near-zero terms: a
    # shadowgram that barely moves from vacuum would otherwise get a
    # ~1/0 weight that amplifies CIC shot noise over the informative
    # phase term (measured at the 33^3 smoke)
    t0_ = {}
    for v in VIEWS:
        l_sh0 = float(np.mean(((vac[v][0] - np.asarray(tgt_shadow[v]))
                               / sc_sh[v]) ** 2))
        tp = np.asarray(tgt_phase[v])
        l_ph0 = float((beam_px * (tp / sc_ph[v]) ** 2).sum()
                      / beam_px.sum())
        t0_[v] = (l_sh0, l_ph0)
    floor = 1e-2 * max(t0_[v][i] for v in VIEWS for i in (0, 1))
    wts = {v: (1.0 / max(t0_[v][0], floor),
               1.0 / max(t0_[v][1], floor)) for v in VIEWS}

    def loss_fn(params):
        g, terms = data_terms(params)
        data = sum(wts[v][0] * terms[v][0] + wts[v][1] * terms[v][1]
                   for v in VIEWS) / (2 * len(VIEWS))
        prior = W_WHITE * white_l2(params)
        return data + prior, terms

    opt = optax.adam(optax.cosine_decay_schedule(LR, ITERS))
    state = opt.init(params0)

    @jax.jit
    def step(p, st):
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, st = opt.update(grads, st)
        return optax.apply_updates(p, upd), st, l, aux

    params = params0
    t0 = time.time()
    for i in range(ITERS):
        params, state, l, aux = step(params, state)
        if i % max(ITERS // 10, 1) == 0:
            txt = "  ".join(
                f"{v}: sh {float(aux[v][0]):.4f} ph {float(aux[v][1]):.4f}"
                for v in VIEWS)
            print(f"iter {i:4d}  loss {float(l):.6f}  {txt}", flush=True)
    jax.block_until_ready(params)
    wall = time.time() - t0

    g_rec = np.asarray(field(params))
    rel_full = (np.linalg.norm(g_rec - g_true)
                / np.linalg.norm(g_true))
    core = (x**2 + y**2 + z**2) < (0.8 * BEAM_R) ** 2
    rel_core = (np.linalg.norm((g_rec - g_true)[core])
                / np.linalg.norm(g_true[core]))

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_hbm = stats.get("peak_bytes_in_use", 0)
    except Exception:
        peak_hbm = 0

    rec = {"dim": DIM, "rays_per_view": RAYS, "iters": ITERS,
           "views": list(VIEWS),
           "benches": ["shadowgraphy", "interferogram->phase_map"],
           "prior": "grf_whitening(k^-4)",
           "wall_s": round(wall, 1),
           "s_per_iter": round(wall / ITERS, 3),
           "rel_l2_full": round(float(rel_full), 4),
           "rel_l2_core": round(float(rel_core), 4),
           "peak_hbm_gb": round(peak_hbm / 2**30, 2),
           "backend": jax.default_backend()}
    print(json.dumps(rec))
    out = os.path.join(_ROOT, "scratch", "results_tomography_r4.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    np.save(os.path.join(_ROOT, "scratch",
                         f"tomography_recovered_{DIM}_{N_VIEWS}v.npy"),
            g_rec)


if __name__ == "__main__":
    main()
