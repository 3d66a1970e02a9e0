"""Tomography loss-landscape probe (round 5).

At DIM^3 compute, for the EXACT loss of probe_tomo_nan.py (modal
parameterisation): per-view, per-bench misfit terms at
  (a) theta = 0 (cold start),
  (b) theta* = modal projection of the truth,
  (c) field(theta*) representation error vs g_true.
If loss(b) << loss(a): landscape fine, optimisation is the problem.
If loss(b) ~ loss(a): targets/weights/representability are the problem.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu.analysis.fringes import (phase_difference,
                                          rectify_phase_offset, unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_multiview_renderers
from synthpy_tpu.priors import make_grf_modal, white_l2
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.ops import dft

DIM = int(os.environ.get("DIM", 33))
RAYS = int(float(os.environ.get("RAYS", 50_000)))
EXT, BEAM_R = 5e-3, 3.2e-3
NE_SCALE = float(os.environ.get("NE", 5e23))
NB = int(os.environ.get("NB", 96))
BINS = (NB, NB)
LXY = 8.0
N_FRINGES = float(os.environ.get("NF", 16.0))
VIEWS = ("z", "x", "y")
SIG, C0 = float(os.environ.get("SIG", 4.0)), -4.0

key = jax.random.PRNGKey(0)
dom = ScalarDomain(2 * EXT, DIM, phaseshift=True)
x = np.asarray(dom.x)[:, None, None]
y = np.asarray(dom.y)[None, :, None]
z = np.asarray(dom.z)[None, None, :]
w2 = (0.8e-3) ** 2
g_true = (0.8 * np.exp(-((x - 0.9e-3) ** 2 + y**2 + (z - 0.7e-3) ** 2) / w2)
          + 0.65 * np.exp(-((x + 0.7e-3) ** 2 + (y - 0.8e-3) ** 2
                            + (z + 0.9e-3) ** 2) / w2)
          + 0.5 * np.exp(-(x**2 + (y + 1.0e-3) ** 2
                           + (z - 0.2e-3) ** 2) / w2)
          + 0.15 * np.exp(-(x**2 + y**2 + z**2) / (1.6e-3) ** 2))
g_true_j = jnp.asarray(g_true, jnp.float32)

beams = {v: init_beam(jax.random.fold_in(key, i), RAYS, BEAM_R, 0.0, EXT,
                      "circular", probing_direction=v)
         for i, v in enumerate(VIEWS)}
beams_m = {v: init_beam(jax.random.fold_in(key, 100 + i), RAYS, BEAM_R,
                        0.0, EXT, "circular", probing_direction=v)
           for i, v in enumerate(VIEWS)}
common = dict(bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
              n_fringes=N_FRINGES)
rend_meas = make_multiview_renderers(
    dom, beams_m, diagnostic=("shadowgraphy", "interferometry"), **common)
rend_model = make_multiview_renderers(
    dom, beams, diagnostic=("shadowgraphy", "phase_map"), **common)

ny, nx = BINS[1], BINS[0]
yy = (np.arange(ny) - ny / 2 + 0.5) / ny * LXY
xx = (np.arange(nx) - nx / 2 + 0.5) / nx * LXY
rr = np.hypot(yy[:, None], xx[None, :])
beam_px = rr < BEAM_R * 1e3 * 0.94
edge_px = (rr > BEAM_R * 1e3 * 0.81) & (rr < BEAM_R * 1e3 * 0.97)


@jax.jit
def meas_all(g):
    return {v: rend_meas[v](NE_SCALE * g) for v in VIEWS}


@jax.jit
def model_all(g):
    return {v: rend_model[v](NE_SCALE * g) for v in VIEWS}


t0 = time.time()
shot = {v: [np.asarray(t) for t in im] for v, im in meas_all(g_true_j).items()}
vac = {v: [np.asarray(t) for t in im]
       for v, im in meas_all(jnp.zeros_like(g_true_j)).items()}
print(f"meas done {time.time()-t0:.0f}s", flush=True)

tgt_shadow, tgt_phase = {}, {}
for v in VIEWS:
    sh, H_shot = shot[v]
    pw = phase_difference(jnp.asarray(H_shot), jnp.asarray(vac[v][1]))
    pu = unwrap_2d(pw, anchor=(ny // 2, nx // 2))
    pu = rectify_phase_offset(pu, edge_px)
    if np.median(pu[beam_px]) > 0:
        pu = -pu
    tgt_shadow[v] = np.asarray(sh)
    tgt_phase[v] = np.asarray(pu)

sc_sh = {v: float(np.abs(tgt_shadow[v]).max()) + 1e-30 for v in VIEWS}
sc_ph = {v: float(np.abs(tgt_phase[v][beam_px]).max()) + 1e-30 for v in VIEWS}

# ---- modal projection of the truth ---------------------------------------
synth, n_modes = make_grf_modal(
    (DIM,) * 3, 2 * EXT / (DIM - 1), lambda k: k ** (-4.0),
    l_max=2 * EXT, l_min=0.5e-3)
print(f"modes {n_modes}", flush=True)

# softplus preimage of the truth, clipped to sane preimage range
gt = np.clip(g_true, 1e-6, None)
s_true = np.where(gt > 20, gt, np.log(np.expm1(gt)))
c_tgt = (s_true - C0) / SIG

# least-squares modal fit: theta*_k = 2 F[c]_k / (n_tot * tau_k) on the
# canonical half modes (factor 2: Re(half-spectrum synth) carries half
# of a Hermitian pair's amplitude). Reuse synth's closure internals by
# recomputing the selection here (same code path as make_grf_modal).
from synthpy_tpu.fields.grf import _safe_spectrum
sp = 2 * EXT / (DIM - 1)
ks = [2 * np.pi * np.fft.fftfreq(DIM, d=sp) for _ in range(3)]
kg = np.meshgrid(*ks, indexing="ij")
k = np.sqrt(sum(g**2 for g in kg))
S = np.asarray(_safe_spectrum(lambda kk: kk ** (-4.0), jnp.asarray(k)))
S = np.where(k >= 2 * np.pi / (2 * EXT), S, 0.0)
S = np.where(k <= 2 * np.pi / 0.5e-3, S, 0.0)
S[0, 0, 0] = 0.0
half = np.zeros((DIM,) * 3, bool)
cond = np.ones((DIM,) * 3, bool)
for g in kg:
    half |= cond & (g > 1e-12)
    cond &= np.abs(g) <= 1e-12
sel = (S > 0) & half
idx = np.flatnonzero(sel.ravel())
tau = np.sqrt(S.ravel()[idx])
tau = tau / np.sqrt((tau**2).sum())
F = np.fft.fftn(c_tgt).ravel()[idx]
n_tot = DIM**3
theta_star = np.stack([2 * F.real / (n_tot * tau),
                       2 * F.imag / (n_tot * tau)], axis=1)
th_j = jnp.asarray(theta_star, jnp.float32)
g_star = np.asarray(jax.nn.softplus(C0 + SIG * synth(th_j)))
rep_err = np.linalg.norm(g_star - g_true) / np.linalg.norm(g_true)
print(f"representation rel_l2(field(theta*), g_true) = {rep_err:.4f} "
      f"gmax*={g_star.max():.3f} vs {g_true.max():.3f} "
      f"white_l2={float(white_l2(th_j)):.4f}", flush=True)

# ---- loss terms at 0 and theta* ------------------------------------------
def terms_of(g_field):
    out = model_all(jnp.asarray(g_field, jnp.float32))
    res = {}
    for v in VIEWS:
        im_sh, im_ph = [np.asarray(t) for t in out[v]]
        l_sh = float(np.mean(((im_sh - tgt_shadow[v]) / sc_sh[v]) ** 2))
        l_ph = float((beam_px * ((im_ph - tgt_phase[v]) / sc_ph[v]) ** 2
                      ).sum() / beam_px.sum())
        res[v] = (l_sh, l_ph)
    return res

t_zero = terms_of(np.zeros((DIM,) * 3))
t_star = terms_of(g_star)
t_true = terms_of(g_true)
# the t0_ weights of the fit script (from MEAS vacuum renders)
t0_ = {}
for v in VIEWS:
    l_sh0 = float(np.mean(((vac[v][0] - tgt_shadow[v]) / sc_sh[v]) ** 2))
    l_ph0 = float((beam_px * (tgt_phase[v] / sc_ph[v]) ** 2).sum()
                  / beam_px.sum())
    t0_[v] = (l_sh0, l_ph0)
floor = 1e-2 * max(t0_[v][i] for v in VIEWS for i in (0, 1))
wts = {v: (1.0 / max(t0_[v][0], floor), 1.0 / max(t0_[v][1], floor))
       for v in VIEWS}

import json
for name, tt in (("zero", t_zero), ("star", t_star), ("true", t_true)):
    data = sum(wts[v][0] * tt[v][0] + wts[v][1] * tt[v][1]
               for v in VIEWS) / (2 * len(VIEWS))
    print(json.dumps({"at": name, "data": round(data, 4),
                      "terms": {v: [round(a, 5) for a in tt[v]]
                                for v in VIEWS}}), flush=True)
print(json.dumps({"meas_t0": {v: [round(a, 5) for a in t0_[v]]
                              for v in VIEWS},
                  "wts": {v: [round(a, 2) for a in wts[v]]
                          for v in VIEWS}}), flush=True)
