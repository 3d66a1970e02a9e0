"""Experimental-scale JOINT inversion: a 128^3-class field from 3 benches.

The round-3 flagship inverse demo (ROADMAP round-3 item): recover a
transverse electron-density map, extruded through a known z-envelope
into a full volume, from THREE synthetic diagnostics of the same shot —
shadowgraphy, dark-field schlieren and an INTERFEROGRAM — following the
standard experimental interferometry workflow end-to-end:

* the interferogram "measurement" is demodulated ONCE on the host
  (Takeda sideband extraction, analysis.fringes.phase_difference with a
  background shot), unwrapped outward from the beam centre
  (unwrap_2d(anchor=...)), offset-rectified against a zero-phase edge
  annulus (rectify_phase_offset), and sign-fixed by physics (plasma
  phase is negative). This is exactly what an experimentalist does to a
  real fringe image before inverting it;
* the differentiable forward model renders shadowgraphy + schlieren +
  a PHASE MAP (inverse.make_renderer's "phase_map" bench: per-pixel
  transmission-weighted mean traced phase through the interferometry
  lens train). Phase is LINEAR in ne, so the phase term is smooth and
  pins the absolute density scale that the incoherent benches leave
  degenerate — where a raw fringe-image MSE is wrap-trapped from any
  cold start (measured: it plateaus at 4x the incoherent loss and drags
  recovery to rel_l2 ~ 0.6; the phase object here is ~6 rad deep, and
  at the previous 5e24 scale it was ~60 rad deep and physically
  un-demodulable at detector resolution — real experiments size the
  probe so the object is a few fringes, which this demo now does);
* TV regularisation (pixel-space prior) fills the beam-unsampled
  corners; positivity via softplus.

Every piece runs the production machinery differentiably: pack build ->
segmented slab march (segment-granularity remat, inverse.py) -> composed
ABCD optics -> CIC detectors, via make_renderer's multi-diagnostic mode
(one trace, three benches).

Measured on one v5e chip: see scratch/results_inverse_joint_r3.json —
the script appends wall time, per-iter time and relative-L2 recovery
error inside the beam-sampled region.

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

from synthpy_tpu.analysis.fringes import (phase_difference,
                                          rectify_phase_offset,
                                          unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.priors import tv
from synthpy_tpu.tracer import init_beam

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
RAYS = int(float(sys.argv[2])) if len(sys.argv) > 2 else 400_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
# peak lr: the 128^3 default (2e-2) oscillates at 512^3 (loss climbs
# from 0.20 to 0.25 and plateaus, measured); larger maps need a gentler
# schedule
LR = float(sys.argv[4]) if len(sys.argv) > 4 else 2e-2
# dark-field weight multiplier: the DF image is a near-binary function
# of each ray's deflection crossing the stop threshold, so far from the
# solution its MSE gradient is spiky and fights the smooth benches
# (measured at 512^3: the balanced schlieren term CLIMBS 0.151 -> 0.177
# while shadow+phase fall). Down-weight it and let the smooth benches
# carry the descent; it still pins the solution near convergence.
W_SCHL = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0

EXT = 5e-3
NE_SCALE = 5e23        # ~6 rad peak phase: a few-fringe object (demodulable)
BEAM_R = 3.2e-3
BINS = (96, 96)
LXY = 8.0              # detector mm; beam fills it
N_FRINGES = 16.0


def main():
    key = jax.random.PRNGKey(0)
    dom = ScalarDomain(2 * EXT, DIM)
    dom.phaseshift = True  # phase benches need accumulated phase

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
    s0 = init_beam(jax.random.fold_in(key, 1), RAYS, BEAM_R, 0.0, EXT,
                   "circular")

    # ---- synthetic "measurements": shot + background ----------------
    # dark-field stop sized to this shot's MEASURED deflections (max
    # 0.74 mrad -> 0.30 mm at the Fourier plane): 0.12 mm passes the
    # theta > 0.3 mrad tail. The default 1 mm stop would block every
    # ray — an all-zero schlieren target whose normalisation then
    # explodes the loss (the degeneracy assert below catches this)
    bench_kw = {"schlieren_df": {"stop_R": 0.12}}
    # 256^3+: bf16 traced pack — the f32 chain's backward pass needs
    # ~41 GB at 512^3; bf16 + the checkpointed pack build fit one chip
    pdt = jnp.bfloat16 if DIM >= 256 else None
    render_meas = make_renderer(
        dom, s0, diagnostic=("shadowgraphy", "schlieren_df",
                             "interferometry"),
        bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
        n_fringes=N_FRINGES, bench_kwargs=bench_kw, pack_dtype=pdt)
    meas = jax.jit(lambda g: render_meas(volume(g)))
    tgt_shadow, tgt_schlieren, H_shot = [
        np.asarray(t) for t in meas(jnp.asarray(g_true))]
    H_bkg = np.asarray(meas(jnp.zeros_like(jnp.asarray(g_true)))[2])
    for nm, t in (("shadowgraphy", tgt_shadow),
                  ("schlieren_df", tgt_schlieren),
                  ("interferogram", H_shot)):
        assert np.abs(t).max() > 1e-3, (
            f"degenerate {nm} target (all ~zero): check bench geometry "
            "vs the deflection scale of this shot")

    # ---- experimental phase-retrieval workflow on the interferogram -
    ny, nx = H_shot.shape
    pw = phase_difference(jnp.asarray(H_shot), jnp.asarray(H_bkg))
    pu = unwrap_2d(pw, anchor=(ny // 2, nx // 2))
    yy = (np.arange(ny) - ny / 2 + 0.5) / ny * LXY
    xx = (np.arange(nx) - nx / 2 + 0.5) / nx * LXY
    rr = np.hypot(yy[:, None], xx[None, :])
    beam_px = rr < BEAM_R * 1e3 * 0.94
    edge_px = (rr > BEAM_R * 1e3 * 0.81) & (rr < BEAM_R * 1e3 * 0.97)
    pu = rectify_phase_offset(pu, edge_px)
    if np.median(pu[beam_px]) > 0:
        pu = -pu  # sideband sign ambiguity; plasma phase is negative
    tgt_phase = jnp.asarray(pu)
    phase_mask = jnp.asarray(beam_px)

    # ---- differentiable forward model -------------------------------
    render = make_renderer(
        dom, s0, diagnostic=("shadowgraphy", "schlieren_df", "phase_map"),
        bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
        bench_kwargs=bench_kw, pack_dtype=pdt)
    render_v = lambda g: render(volume(g))

    sc_shadow = float(np.abs(tgt_shadow).max()) + 1e-30
    sc_schl = float(np.abs(tgt_schlieren).max()) + 1e-30
    sc_phase = float(np.abs(pu[beam_px]).max()) + 1e-30
    tv_w = 3e-3

    def data_terms(theta):
        g = jax.nn.softplus(theta)  # positivity
        im_sh, im_sc, im_ph = render_v(g)
        l_sh = jnp.mean(((im_sh - tgt_shadow) / sc_shadow) ** 2)
        l_sc = jnp.mean(((im_sc - tgt_schlieren) / sc_schl) ** 2)
        l_ph = (jnp.sum(phase_mask * ((im_ph - tgt_phase)
                                      / sc_phase) ** 2)
                / phase_mask.sum())
        return g, l_sh, l_sc, l_ph

    theta0 = jnp.full((DIM, DIM), -1.5)  # softplus^-1 of ~0.2 pedestal
    # balance the benches by their cold-start misfits: the raw
    # max-normalised MSEs differ by orders of magnitude between benches
    # and grids (at 512^3 the sparse spiky dark-field image starts at
    # 0.15 while shadowgraphy starts at 9e-4, measured — unbalanced, the
    # schlieren term hijacks the descent and the loss climbs)
    _, l0_sh, l0_sc, l0_ph = jax.jit(data_terms)(theta0)
    w_sh = 1.0 / (float(l0_sh) + 1e-12)
    w_sc = W_SCHL / (float(l0_sc) + 1e-12)
    w_ph = 1.0 / (float(l0_ph) + 1e-12)

    def loss_fn(theta):
        g, l_sh, l_sc, l_ph = data_terms(theta)
        l_tv = tv_w * tv(g)
        total = (w_sh * l_sh + w_sc * l_sc + w_ph * l_ph) / 3.0 + l_tv
        return total, (l_sh, l_sc, l_ph, l_tv)

    theta = theta0
    # cosine-decayed adam: a flat 3e-2 oscillates at the 128^3 scale
    # (measured: loss 0.044 -> 0.010 by iter 60, back up to 0.033 by
    # iter 100); decaying to zero converges monotonically
    opt = optax.adam(optax.cosine_decay_schedule(LR, ITERS))
    state = opt.init(theta)

    @jax.jit
    def step(th, st):
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(th)
        upd, st = opt.update(grads, st)
        return optax.apply_updates(th, upd), st, l, aux

    t0 = time.time()
    for i in range(ITERS):
        theta, state, l, aux = step(theta, state)
        if i % max(ITERS // 10, 1) == 0:
            sh, sc, ph, tvl = [float(a) for a in aux]
            print(f"iter {i:4d}  loss {float(l):.6f}  "
                  f"(shadow {sh:.4f}  schlieren {sc:.4f}  "
                  f"phase {ph:.4f}  tv {tvl:.4f})", flush=True)
    jax.block_until_ready(theta)
    wall = time.time() - t0

    g_rec = np.asarray(jax.nn.softplus(theta))
    # error metrics inside the beam-sampled disc
    r2 = (x**2 + y**2)
    mask = r2 < BEAM_R**2
    rel_all = (np.linalg.norm(g_rec - g_true)
               / np.linalg.norm(g_true))
    rel_beam = (np.linalg.norm((g_rec - g_true)[mask])
                / np.linalg.norm(g_true[mask]))

    from synthpy_tpu.utils import live_hbm_gb, peak_hbm_gb
    peak = peak_hbm_gb()   # None (-> JSON null) where stats are absent

    def _fin(v, nd=4):
        v = float(v)
        return round(v, nd) if np.isfinite(v) else None

    rec = {"dim": DIM, "rays": RAYS, "iters": ITERS,
           "benches": ["shadowgraphy", "schlieren_df",
                       "interferogram->phase_map"],
           "wall_s": round(wall, 1),
           "s_per_iter": round(wall / ITERS, 3),
           "rel_l2_full": _fin(rel_all),
           "rel_l2_beam": _fin(rel_beam),
           "peak_hbm_gb": None if peak is None else round(peak, 2),
           "live_hbm_gb": round(live_hbm_gb(), 2),
           "backend": jax.default_backend()}
    print(json.dumps(rec, allow_nan=False))
    out = os.path.join(_ROOT, "scratch",
                       "results_inverse_joint_r3.json")
    with open(out, "a") as f:
        f.write(json.dumps(rec, allow_nan=False) + "\n")
    np.save(os.path.join(_ROOT, "scratch",
                         "inverse_joint_recovered.npy"), g_rec)


if __name__ == "__main__":
    main()
