"""Multi-view TOMOGRAPHIC inversion: a genuinely 3-D field from 2-3 views.

Single-view inversion is ill-posed along the probing axis: a parallel
view's data is (to first order) a projection, so every Fourier mode
with a nonzero wavenumber component along that axis integrates to zero
and the recovery collapses to the beam-integrated 2.5-D field (measured
round 3: rel_l2_beam 0.385 but rel_l2_full 0.87-0.89,
scratch/results_inverse_joint_r3.json). This script closes that gap the
way experiments do — probe the SAME shot from orthogonal directions —
and fits one shared 3-D volume jointly against every view's phase
measurements:

* ground truth: three Gaussian density blobs at distinct 3-D positions
  on a compact pedestal — structure a single view provably cannot
  localise (the z-view phase map of a blob is INDEPENDENT of the blob's
  z position; verified in tests/test_inverse.py::
  test_multiview_sees_probing_axis_structure);
* per view ('z', 'x', 'y'): a circular beam probes along that axis.
  The synthetic measurements use an INDEPENDENT ray sample from the
  model's quadrature rays (an experiment's photons are not the model's
  sample points — avoids the trivial inverse crime);
* two target modes (CLI arg 6):
  - ``phase``: the measurement is the retrieved per-view phase map
    (what fringe analysis of a good interferogram hands the analyst);
  - ``wrap``: the measurement is a full INTERFEROGRAM, demodulated by
    Takeda sideband extraction into a WRAPPED phase difference plus a
    fringe-visibility map; the loss is circular (mod-2pi residual)
    weighted by visibility, so modulation-depleted pixels cannot
    corrupt the fit and no unwrap step is needed;
* the unknown volume is parameterised IN MODE SPACE by the bounded
  modal GRF prior (priors.make_grf_modal): g = support * SIG *
  synth(u) with a standard-normal penalty on u — exact MAP inference
  under the Gaussian-process prior AND bounded per-mode step sizes
  under Adam (the real-space whitened parameterisation's low-k gain
  grows with resolution and diverged at 128^3: rel_l2_full 581,
  scratch/results_tomography_r4.jsonl; falsification history in
  ROADMAP.md "Tomography");
* the field map is LINEAR in the parameters — phase tomography is a
  linear problem, so (quadratic loss + Gaussian prior) is convex with
  a unique minimum; positivity is a one-sided penalty, not a softplus
  warp (the warp forced overshooting compact blobs through the 3-view
  null space: measured rel_l2 0.84 at 33^3 on PERFECT phase targets);
* ``support``: a soft product of the three probed beam cylinders —
  the object is reconstructed where at least every view's aperture
  saw it, zero in the never-probed corners;
* the joint loss sums every view's visibility-weighted phase misfit,
  cold-start-balanced against the MODEL's own theta=0 render (the
  independent-beam CIC noise floor makes measurement-side balancing
  spend the gradient on unfittable noise); jax.grad runs through all
  traces (inverse.make_renderer's segment-remat march) at once.

The forward surface is inverse.make_multiview_renderers: one call
builds the renderer per probing direction over copies of the same
domain. The reference cannot express any of this — its trace is not
differentiable (reference full_solver.py:376-403) and its probing
direction is a per-run scalar, never jointly fitted.

Usage: python examples/inverse_tomography_multiview.py \
          [dim] [rays_per_view] [iters] [n_views] [lr] [target] [budget_s]
(CPU smoke: dim=33 rays=50000 iters=40 n_views=3 finishes in ~2 min.
budget_s caps the OPTIMISATION wall clock: the loop stops at the first
iteration past the budget and the record carries the iterations that
actually ran — large-dim runs always leave a measurement behind.)
n_views=1 runs the single-view baseline on the identical truth and
parameterisation — the apples-to-apples comparison for rel_l2_full.
Measured results: scratch/results_tomography_r5.jsonl.
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

from synthpy_tpu.analysis.fringes import phase_difference
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_multiview_renderers
from synthpy_tpu.priors import make_grf_modal, white_l2
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.utils import live_hbm_gb, peak_hbm_gb

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
RAYS = int(float(sys.argv[2])) if len(sys.argv) > 2 else 600_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 300
N_VIEWS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
LR = float(sys.argv[5]) if len(sys.argv) > 5 else 3e-2
TARGET = sys.argv[6] if len(sys.argv) > 6 else "phase"   # phase | wrap
BUDGET_S = float(sys.argv[7]) if len(sys.argv) > 7 else None

EXT = 5e-3
NE_SCALE = 5e23        # few-fringe object: demodulable at detector res
BEAM_R = 3.2e-3
BINS = (96, 96)
LXY = 8.0
N_FRINGES = 16.0
VIEWS = ("z", "x", "y")[:N_VIEWS]
# GRF prior band: correlation lengths between half the box and the
# detector-resolvable scale; k^-4 favours the blob scale
L_MAX, L_MIN = 2 * EXT, 0.5e-3
# prior std in field units (g_true peaks ~1.1): sized so the posterior
# is data-dominated inside the band without letting the null space run
SIG = 4.0
W_WHITE = 1e-2
W_NEG = 10.0           # one-sided positivity penalty on the linear field
# Shadowgram channel weight. The independent-beam shadow residual at
# these ray counts is ~96% irreducible CIC shot noise (measured,
# scratch/probe_tomo_lossscape.py r5), so the default fit is phase-only;
# raise for ray counts where the shadow term carries real signal.
W_SHADOW = 0.0


def main():
    key = jax.random.PRNGKey(0)
    dom = ScalarDomain(2 * EXT, DIM, phaseshift=True)

    # ---- ground truth: 3 blobs at distinct 3-D positions ------------
    # compact (inside r ~ 2 mm) so every view's edge annulus sees zero
    # phase and the demodulated targets are absolute
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
    # model rays and measurement rays are INDEPENDENT samples
    beams = {v: init_beam(jax.random.fold_in(key, i), RAYS, BEAM_R, 0.0,
                          EXT, "circular", probing_direction=v)
             for i, v in enumerate(VIEWS)}
    beams_m = {v: init_beam(jax.random.fold_in(key, 100 + i), RAYS,
                            BEAM_R, 0.0, EXT, "circular",
                            probing_direction=v)
               for i, v in enumerate(VIEWS)}
    pdt = jnp.bfloat16 if DIM >= 256 else None
    common = dict(bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
                  n_fringes=N_FRINGES, pack_dtype=pdt)
    rend_meas = make_multiview_renderers(
        dom, beams_m,
        diagnostic=("shadowgraphy",
                    "interferometry" if TARGET == "wrap" else "phase_map"),
        **common)
    rend_model = make_multiview_renderers(
        dom, beams, diagnostic=("shadowgraphy", "phase_map"), **common)

    # ---- synthetic measurements + phase retrieval --------------------
    ny, nx = BINS[1], BINS[0]
    yy = (np.arange(ny) - ny / 2 + 0.5) / ny * LXY
    xx = (np.arange(nx) - nx / 2 + 0.5) / nx * LXY
    rr = np.hypot(yy[:, None], xx[None, :])
    beam_px = rr < BEAM_R * 1e3 * 0.94

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

    tgt_shadow, tgt_phase, tgt_w = {}, {}, {}
    for v in VIEWS:
        sh, H_shot = shot[v]
        assert np.abs(sh).max() > 1e-3 and np.abs(H_shot).max() > 1e-3, (
            f"degenerate measurement for view {v!r}")
        if TARGET == "wrap":
            pu, vis = phase_difference(jnp.asarray(H_shot),
                                       jnp.asarray(vac[v][1]),
                                       return_visibility=True)
            pu, vis = np.asarray(pu), np.clip(np.asarray(vis), 0.0, 1.0)
            # demodulation sideband sign is carrier-convention
            # ambiguous; plasma phase is negative — flip if the
            # confident pixels vote positive (median sits under pi)
            if np.median(pu[beam_px & (vis > 0.5)]) > 0:
                pu = -pu
        else:
            pu = np.asarray(H_shot)
            vis = np.ones_like(pu)
        tgt_shadow[v] = jnp.asarray(sh)
        tgt_phase[v] = jnp.asarray(pu)
        tgt_w[v] = jnp.asarray(vis * beam_px)

    # ---- bounded modal GRF parameterisation, LINEAR field ------------
    synth, n_modes = make_grf_modal(
        (DIM, DIM, DIM), 2 * EXT / (DIM - 1), lambda k: k ** (-4.0),
        l_max=L_MAX, l_min=L_MIN)
    print(f"GRF modal prior: {n_modes} modes", flush=True)

    # support: soft product of every view's probed beam cylinder
    xs = [jnp.asarray(c, jnp.float32) for c in (x, y, z)]
    _r, _w = 0.94 * BEAM_R, 2 * (2 * EXT / (DIM - 1))
    cyl = {"z": jnp.sqrt(xs[0]**2 + xs[1]**2),
           "x": jnp.sqrt(xs[1]**2 + xs[2]**2),
           "y": jnp.sqrt(xs[0]**2 + xs[2]**2)}
    support = jnp.ones((1, 1, 1), jnp.float32)
    for v in VIEWS:
        support = jnp.minimum(support, jax.nn.sigmoid((_r - cyl[v]) / _w))

    def field(u):
        return support * (SIG * synth(u))

    sc_sh = {v: float(np.abs(tgt_shadow[v]).max()) + 1e-30 for v in VIEWS}
    sc_ph = {v: float(np.abs(np.asarray(tgt_phase[v])[beam_px]).max())
             + 1e-30 for v in VIEWS}

    def loss_fn(u, wv):
        # wv: (n_views, 2) runtime weights -> no recompile on rebalance
        g = field(u)
        ne = NE_SCALE * g
        data = 0.0
        terms = []
        for j, v in enumerate(VIEWS):
            im_sh, im_ph = rend_model[v](ne)
            l_sh = jnp.mean(((im_sh - tgt_shadow[v]) / sc_sh[v]) ** 2)
            d = im_ph - tgt_phase[v]
            if TARGET == "wrap":    # circular residual
                d = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
            w = tgt_w[v]
            l_ph = jnp.sum(w * (d / sc_ph[v]) ** 2) / w.sum()
            data = data + wv[j, 0] * l_sh + wv[j, 1] * l_ph
            terms.append(jnp.stack([l_sh, l_ph]))
        data = data / (2 * len(VIEWS))
        loss = (data + W_WHITE * white_l2(u)
                + W_NEG * jnp.mean(jax.nn.relu(-g) ** 2))
        return loss, (data, jnp.stack(terms))

    opt = optax.adam(optax.cosine_decay_schedule(LR, ITERS))
    params = jnp.zeros((n_modes, 2), jnp.float32)
    state = opt.init(params)

    @jax.jit
    def step(p, st, wv):
        (l, (data, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, wv)
        upd, st = opt.update(grads, st)
        return optax.apply_updates(p, upd), st, l, data, terms

    # cold-start balance against the MODEL's own theta=0 misfit: with
    # independent measurement beams the model terms carry an
    # irreducible CIC shot-noise floor the measurement-side vacuum
    # estimate misses (measured 12x on the shadow term)
    _, _, _, _, t0m = step(params, state, jnp.ones((len(VIEWS), 2),
                                                   jnp.float32))
    t0m = np.asarray(t0m)
    floor = 1e-2 * float(t0m.max())
    wv = jnp.asarray(1.0 / np.maximum(t0m, floor), jnp.float32)
    wv = wv * jnp.asarray([[W_SHADOW, 1.0]], jnp.float32)
    print("cold-start weights:", np.round(np.asarray(wv), 2).tolist(),
          flush=True)
    params = jnp.zeros_like(params)
    state = opt.init(params)

    t0 = time.time()
    iters_done = 0
    for i in range(ITERS):
        params, state, l, data, terms = step(params, state, wv)
        iters_done = i + 1
        if i % max(ITERS // 10, 1) == 0 or i == ITERS - 1:
            print(f"iter {i:4d}  loss {float(l):.6f}  "
                  f"data {float(data):.6f}", flush=True)
        if not np.isfinite(float(l)):
            print("loss went non-finite; aborting fit", flush=True)
            break
        if BUDGET_S is not None and time.time() - t0 > BUDGET_S:
            print(f"wall budget {BUDGET_S:.0f}s reached after "
                  f"{iters_done} iters", flush=True)
            break
    jax.block_until_ready(params)
    wall = time.time() - t0

    g_rec = np.asarray(field(params))
    rel_full = np.linalg.norm(g_rec - g_true) / np.linalg.norm(g_true)
    core = (x**2 + y**2 + z**2) < (0.8 * BEAM_R) ** 2
    c3 = np.broadcast_to(core, (DIM,) * 3)
    rel_core = (np.linalg.norm((g_rec - g_true)[c3])
                / np.linalg.norm(g_true[c3]))

    def _fin(v, nd=4):
        v = float(v)
        return round(v, nd) if np.isfinite(v) else None

    peak = peak_hbm_gb()
    rec = {"dim": DIM, "rays_per_view": RAYS, "iters": iters_done,
           "iters_scheduled": ITERS,
           "views": list(VIEWS), "target": TARGET,
           "prior": "grf_modal(k^-4), linear field",
           "sig": SIG, "lr": LR, "n_modes": n_modes,
           "wall_s": round(wall, 1),
           "s_per_iter": round(wall / max(iters_done, 1), 3),
           "rel_l2_full": _fin(rel_full),
           "rel_l2_core": _fin(rel_core),
           "g_max": _fin(g_rec.max(), 3),
           "peak_hbm_gb": None if peak is None else round(peak, 2),
           "live_hbm_gb": round(live_hbm_gb(), 2),
           "backend": jax.default_backend()}
    print(json.dumps(rec, allow_nan=False))
    out = os.path.join(_ROOT, "scratch", "results_tomography_r5.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec, allow_nan=False) + "\n")
    np.save(os.path.join(_ROOT, "scratch",
                         f"tomography_recovered_{DIM}_{N_VIEWS}v.npy"),
            g_rec)


if __name__ == "__main__":
    main()
