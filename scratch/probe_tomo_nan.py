"""Reproduce the 128^3 multi-view NaN at probe scale; find the first bad iter.

Instrument: per-iter loss, max softplus field g, max ne/nc, grad norm.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthpy_tpu import constants as C
from synthpy_tpu.analysis.fringes import (phase_difference,
                                          rectify_phase_offset, unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_multiview_renderers
from synthpy_tpu.priors import make_grf_whitener, white_l2
from synthpy_tpu.tracer import init_beam

import os
DIM = int(os.environ.get("DIM", 65))
RAYS = int(float(os.environ.get("RAYS", 100_000)))
ITERS = int(os.environ.get("IT", 120))
EXT, BEAM_R = 5e-3, 3.2e-3
NE_SCALE = float(os.environ.get("NE", 5e23))
NB = int(os.environ.get("NB", 96))
BINS = (NB, NB)
LXY = 8.0
N_FRINGES = float(os.environ.get("NF", 16.0))
VIEWS = ("z", "x", "y")[:int(os.environ.get("NV", 3))]
SIG = float(os.environ.get("SIG", 4.0))
C0 = float(os.environ.get("C0", -4.0))
WMODE = os.environ.get("WMODE", "meas")   # meas | model
W_WHITE = float(os.environ.get("WW", 1e-2))
LR = float(os.environ.get("LR", 3e-2))
WARM = int(os.environ.get("WARM", 0))

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
# measurement beams: INDEPENDENT ray sample (an experiment's photons are
# not the model's quadrature points — avoids the trivial inverse crime)
beams_m = {v: init_beam(jax.random.fold_in(key, 100 + i), RAYS, BEAM_R,
                        0.0, EXT, "circular", probing_direction=v)
           for i, v in enumerate(VIEWS)}
common = dict(bins=BINS, K=max(DIM // 8, 8), Lx=LXY, Ly=LXY,
              n_fringes=N_FRINGES)
TGT = os.environ.get("TGT", "demod")
rend_meas = make_multiview_renderers(
    dom, beams_m,
    diagnostic=("shadowgraphy",
                "interferometry" if TGT in ("demod", "wrap")
                else "phase_map"),
    **common)
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


shot = {v: [np.asarray(t) for t in im] for v, im in meas_all(g_true_j).items()}
vac = {v: [np.asarray(t) for t in im]
       for v, im in meas_all(jnp.zeros_like(g_true_j)).items()}

tgt_shadow, tgt_phase, tgt_vis = {}, {}, {}
for v in VIEWS:
    sh, H_shot = shot[v]
    if TGT == "demod":
        pw = phase_difference(jnp.asarray(H_shot), jnp.asarray(vac[v][1]))
        pu = unwrap_2d(pw, anchor=(ny // 2, nx // 2))
        pu = rectify_phase_offset(pu, edge_px)
        if np.median(pu[beam_px]) > 0:
            pu = -pu
        vis = np.ones_like(pu)
    elif TGT == "wrap":
        # fit the WRAPPED phase difference directly (circular loss) —
        # no unwrap step, so low-visibility pixels cannot corrupt
        # unwrap paths; their own noise is handled by the visibility
        # weight instead.
        pu, vis = phase_difference(jnp.asarray(H_shot),
                                   jnp.asarray(vac[v][1]),
                                   return_visibility=True)
        vis = np.clip(vis, 0.0, 1.0)
        # demodulation sideband sign is carrier-convention ambiguous;
        # plasma phase is negative — flip if the confident pixels vote
        # positive (same heuristic as the demod path, wrap-safe because
        # the voting median sits well under pi)
        if np.median(pu[beam_px & (vis > 0.5)]) > 0:
            pu = -pu
    else:
        pu = np.asarray(H_shot)
        vis = np.ones_like(pu)
    tgt_shadow[v] = jnp.asarray(sh)
    tgt_phase[v] = jnp.asarray(pu)
    tgt_vis[v] = jnp.asarray(vis * beam_px)
phase_mask = jnp.asarray(beam_px)

if int(os.environ.get("CHECK", 0)):
    # forward consistency: model phase_map(truth) vs demodulated target
    @jax.jit
    def model_all(g):
        return {v: rend_model[v](NE_SCALE * g) for v in VIEWS}
    mt = {v: [np.asarray(t) for t in im]
          for v, im in model_all(g_true_j).items()}
    for v in VIEWS:
        mp = mt[v][1]
        tp = np.asarray(tgt_phase[v])
        m = beam_px
        num = np.linalg.norm((mp - tp)[m])
        den = np.linalg.norm(tp[m]) + 1e-30
        print(f"view {v}: phase tgt rel err {num/den:.4f} "
              f"model[min,max]=({mp[m].min():.2f},{mp[m].max():.2f}) "
              f"tgt=({tp[m].min():.2f},{tp[m].max():.2f})", flush=True)
        sh_m = mt[v][0]; sh_t = np.asarray(tgt_shadow[v])
        print(f"view {v}: shadow rel err "
              f"{np.linalg.norm(sh_m-sh_t)/np.linalg.norm(sh_t):.4f}",
              flush=True)
    sys.exit(0)

import os as _os
LMAX = float(_os.environ.get("LMAX", 2 * EXT))
LMIN = float(_os.environ.get("LMIN", 0.5e-3))
MODAL = int(_os.environ.get("MODAL", 0))
if MODAL:
    from synthpy_tpu.priors import make_grf_modal
    colorize, n_modes = make_grf_modal(
        (DIM, DIM, DIM), 2 * EXT / (DIM - 1), lambda k: k ** (-4.0),
        l_max=LMAX, l_min=LMIN)
else:
    colorize, n_modes = make_grf_whitener(
        (DIM, DIM, DIM), 2 * EXT / (DIM - 1), lambda k: k ** (-4.0),
        l_max=LMAX, l_min=LMIN)
print(f"modes {n_modes} modal={MODAL}", flush=True)

NC = C.critical_density(C.omega_from_lwl(1064e-9))


MASK = int(os.environ.get("MASK", 0))
if MASK:
    # support prior: the object lies inside the probed aperture (every
    # view's beam cylinder) — reconstruct there, zero elsewhere.
    xs = [jnp.asarray(c, jnp.float32) for c in (x, y, z)]
    _r = 0.94 * BEAM_R
    _w = 2 * (2 * EXT / (DIM - 1))
    import functools
    cyls = [jnp.sqrt(xs[0]**2 + xs[1]**2),   # z view
            jnp.sqrt(xs[1]**2 + xs[2]**2),   # x view
            jnp.sqrt(xs[0]**2 + xs[2]**2)]   # y view
    m = functools.reduce(jnp.minimum,
                         [jax.nn.sigmoid((_r - r) / _w) for r in cyls])
    support = m
else:
    support = 1.0


PARAM = os.environ.get("PARAM", "softplus")   # softplus | linear
W_NEG = float(os.environ.get("WNEG", 10.0))

if PARAM == "linear":
    # Phase tomography is LINEAR in ne; a linear field parameterisation
    # makes (quadratic loss + Gaussian prior) convex with a unique
    # minimum. Positivity becomes a one-sided penalty instead of a
    # softplus warp — the warp is what forced 2x-overshooting compact
    # blobs through the 3-view null space (DC-less zero-mean preimage
    # cannot hold a vacuum plateau AND wide blobs; measured rel_l2 0.84
    # at 33^3 on PERFECT phase targets with data residual 4e-4).
    def field(theta):
        return support * (SIG * colorize(theta))

    def neg_penalty(g):
        return W_NEG * jnp.mean(jax.nn.relu(-g) ** 2)
else:
    def field(theta):
        return support * jax.nn.softplus(C0 + SIG * colorize(theta))

    def neg_penalty(g):
        return 0.0


sc_sh = {v: float(np.abs(tgt_shadow[v]).max()) + 1e-30 for v in VIEWS}
sc_ph = {v: float(np.abs(np.asarray(tgt_phase[v])[beam_px]).max()) + 1e-30
         for v in VIEWS}

t0_ = {}
for v in VIEWS:
    l_sh0 = float(np.mean(((vac[v][0] - np.asarray(tgt_shadow[v]))
                           / sc_sh[v]) ** 2))
    tp = np.asarray(tgt_phase[v])
    l_ph0 = float((beam_px * (tp / sc_ph[v]) ** 2).sum() / beam_px.sum())
    t0_[v] = (l_sh0, l_ph0)
floor = 1e-2 * max(t0_[v][i] for v in VIEWS for i in (0, 1))
wts = {v: (1.0 / max(t0_[v][0], floor), 1.0 / max(t0_[v][1], floor))
       for v in VIEWS}


def loss_fn(params, wv):
    # wv: (n_views, 2) runtime weight array -> no recompile on rebalance
    g = field(params)
    ne = NE_SCALE * g
    data = 0.0
    terms = []
    for j, v in enumerate(VIEWS):
        im_sh, im_ph = rend_model[v](ne)
        l_sh = jnp.mean(((im_sh - tgt_shadow[v]) / sc_sh[v]) ** 2)
        if TGT == "wrap":
            d = im_ph - tgt_phase[v]
            r = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
            w = tgt_vis[v]
            l_ph = jnp.sum(w * (r / sc_ph[v]) ** 2) / w.sum()
        else:
            l_ph = (jnp.sum(phase_mask
                            * ((im_ph - tgt_phase[v]) / sc_ph[v]) ** 2)
                    / phase_mask.sum())
        data = data + wv[j, 0] * l_sh + wv[j, 1] * l_ph
        terms.append(jnp.stack([l_sh, l_ph]))
    data = data / (2 * len(VIEWS))
    return (data + W_WHITE * white_l2(params) + neg_penalty(g),
            (data, jnp.stack(terms)))


sched = (optax.warmup_cosine_decay_schedule(0.0, LR, WARM, ITERS)
         if WARM else optax.cosine_decay_schedule(LR, ITERS))
opt = optax.adam(sched)
params = jnp.zeros((n_modes, 2) if MODAL else (DIM, DIM, DIM), jnp.float32)
state = opt.init(params)


@jax.jit
def step(p, st, wv):
    (l, (data, terms)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(p, wv)
    gmax = jnp.max(jnp.abs(grads))
    upd, st = opt.update(grads, st)
    p2 = optax.apply_updates(p, upd)
    g = field(p2)
    return p2, st, l, data, terms, gmax, jnp.max(g), jnp.max(jnp.abs(p2))


wv = jnp.asarray([[wts[v][0], wts[v][1]] for v in VIEWS], jnp.float32)
if WMODE == "model":
    # cold-start balance against the MODEL's own misfit at theta=0: with
    # independent measurement beams the model terms carry an irreducible
    # CIC shot-noise floor the meas-side vacuum estimate misses (measured
    # 12x on the shadow term, /tmp/tomo_loss33.log r5) — meas-side
    # weights then spend the whole gradient on unfittable noise.
    _, _, _, _, t0m, _, _, _ = step(params, state, jnp.ones_like(wv))
    t0m = np.asarray(t0m)
    floor = 1e-2 * float(t0m.max())
    wv = jnp.asarray(1.0 / np.maximum(t0m, floor), jnp.float32)
    print("model-side t0:", np.round(t0m, 5).tolist(),
          "weights:", np.round(np.asarray(wv), 2).tolist(), flush=True)
    params = jnp.zeros_like(params)
    state = opt.init(params)
# WSH: shadow-channel weight multiplier (0 = phase-only fit). The shadow
# term's cold-start value is ~96% irreducible CIC shot noise at probe ray
# counts (scratch/probe_tomo_lossscape.py r5), so normalising it to 1
# hands most of the gradient budget to noise-fitting.
WSH = float(os.environ.get("WSH", 1.0))
wv = wv * jnp.asarray([[WSH, 1.0]], jnp.float32)

for i in range(ITERS):
    params, state, l, data, terms, gmax, fmax, pmax = step(params, state, wv)
    if i % 10 == 0 or i == ITERS - 1:
        print(f"it {i:3d} loss {float(l):.5f} data {float(data):.5f} "
              f"gmax {float(fmax):.3e} |p|max {float(pmax):.3f}",
              flush=True)
    if not np.isfinite(float(l)):
        break
g_rec = np.asarray(field(params))
rel_full = np.linalg.norm(g_rec - g_true) / np.linalg.norm(g_true)
core = (x**2 + y**2 + z**2) < (0.8 * BEAM_R) ** 2
c3 = np.broadcast_to(core, (DIM,) * 3)
rel_core = np.linalg.norm((g_rec - g_true)[c3]) / np.linalg.norm(g_true[c3])
import json
def _fin(v, nd=4):
    v = float(v)
    return round(v, nd) if np.isfinite(v) else None
rec = {"DIM": DIM, "MODAL": MODAL, "MASK": MASK, "WW": W_WHITE, "LR": LR,
       "WARM": WARM, "iters": ITERS, "LMAX": LMAX, "LMIN": LMIN,
       "rays": RAYS, "SIG": SIG, "C0": C0, "WMODE": WMODE, "WSH": WSH,
       "TGT": TGT, "PARAM": PARAM,
       "n_views": len(VIEWS),
       "rel_l2_full": _fin(rel_full),
       "rel_l2_core": _fin(rel_core),
       "gmax": _fin(g_rec.max(), 3)}
print(json.dumps(rec, allow_nan=False, default=str), flush=True)
with open("/root/repo/scratch/results_tomo_probe_r5.jsonl", "a") as f:
    f.write(json.dumps(rec, allow_nan=False, default=str) + "\n")
