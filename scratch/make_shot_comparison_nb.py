"""Build + execute notebooks/shot_comparison.ipynb (CPU, ~2 min)."""
import nbformat as nbf
from nbclient import NotebookClient

nb = nbf.v4.new_notebook()
C = nbf.v4.new_code_cell
M = nbf.v4.new_markdown_cell

nb.cells = [
    M("""# Registering an experimental shot against its synthetic twin

The workflow an experimentalist runs when a real camera frame meets its
synthetic prediction (reference `src/utils/imaging.py` + the
interferometry evaluation scripts):

1. trace the **synthetic twin** (interferogram + background),
2. corrupt it into a **"shot"** — mount rotation, beam walk-off,
   vignetting, Poisson + read noise,
3. **register** the shot onto the twin (`analysis.register`: windowed
   cross-correlation, coarse-to-fine in angle — no fiducials),
4. run the **identical backward chain** on both frames
   (Takeda demodulation → unwrap → rectify → inverse Abel),
5. overlay profiles (`Image.profile_line`) and radial densities.

Runs on CPU in ~2 min (the coherent Jones surface needs complex
transfers the remote-attach TPU service lacks)."""),
    C("""import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
# fixed-order colorblind-safe series colors (truth / twin / shot)
C_TRUTH, C_TWIN, C_SHOT = "#555555", "#0172B1", "#DE8F05"
"""),
    M("""## 1. Forward: the synthetic twin

A cylindrical Gaussian plasma column (axis along the detector's x),
traced with phase accumulation and interfered with a 40-fringe tilted
reference — plus the matching no-plasma background frame."""),
    C("""from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.optics import Interferometry
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import solve_zscan

ext, lwl, ne0, w = 5e-3, 1064e-9, 1e24, 2e-3
dim, rays = 65, 400_000
d = ScalarDomain(2 * ext, dim)
Y, Z = jnp.meshgrid(d.y, d.z, indexing="ij")
prof = ne0 * jnp.exp(-(Y**2 + Z**2) / w**2)
d.external_ne(jnp.broadcast_to(prof[None], (dim,) * 3))
d.phaseshift = True
s0 = init_beam(jax.random.PRNGKey(0), rays, 4.5e-3, 0.0, ext, "circular")
res = solve_zscan(s0, d, return_E=True, lwl=lwl)
it = Interferometry(lwl, res.rf, res.Jf)
it.two_lens_solve(n_fringes=40, deg=20)
H_syn = np.asarray(it.interferogram(bin_scale=8))
bkg = np.asarray(it.bkg(n_fringes=40, deg=20, bin_scale=8))
ny, nx = H_syn.shape
px_r, px_a = 13.5 / ny, 18.0 / nx
print(H_syn.shape)"""),
    M("""## 2. The "shot": pose error + camera noise

What a real frame carries that the synthetic one doesn't: the camera
was mounted 2.3° off, the beam walked (4.6, −3.1) px between the
reference and the shot, the relay vignettes, and the detector adds
Poisson + read noise."""),
    C("""from synthpy_tpu.analysis import Image, register

rng = np.random.default_rng(42)
syn_im = Image(H_syn, mm_per_px=(px_a, px_r))
true_rot, true_walk = 2.3, (4.6, -3.1)
moved = syn_im.rotate(true_rot).shift(*true_walk)
yy, xx = np.mgrid[0:ny, 0:nx]
vign = 1.0 - 0.6 * (((xx - nx/2)/nx)**2 + ((yy - ny/2)/ny)**2)
counts = np.clip(moved.data, 0, None) * vign
counts *= 400.0 / counts.max()
shot = rng.poisson(counts) + rng.normal(0.0, 2.0, counts.shape)
shot_im = Image(shot, mm_per_px=(px_a, px_r))

fig, axs = plt.subplots(1, 2, figsize=(10, 3.2))
for ax, im, t in ((axs[0], H_syn, "synthetic twin"),
                  (axs[1], shot, "shot (rotated, shifted, noisy)")):
    ax.imshow(im, origin="lower", cmap="gray", interpolation="nearest")
    ax.set_title(t); ax.set_xticks([]); ax.set_yticks([])
plt.tight_layout(); plt.show()"""),
    M("""## 3. Registration — recover the pose, no fiducials

Windowed FFT cross-correlation at each candidate angle, coarse-to-fine;
the peak height is a confidence score. Note the recovered walk-off is
expressed in the de-rotated frame, `R(−angle) @ walk`."""),
    C("""ang, (sx, sy), score = register(syn_im, shot_im, angle_range=(-8, 8))
aligned = shot_im.rotate(-ang).shift(-sx, -sy)
c, s = np.cos(np.deg2rad(-ang)), np.sin(np.deg2rad(-ang))
exp_walk = (c*true_walk[0] + s*true_walk[1], -s*true_walk[0] + c*true_walk[1])
print(f"true rotation {true_rot:+.2f} deg -> recovered {ang:+.2f} deg")
print(f"expected de-rotated walk ({exp_walk[0]:+.2f}, {exp_walk[1]:+.2f}) px"
      f" -> recovered ({sx:+.2f}, {sy:+.2f}) px, score {score:.3f}")"""),
    M("""## 4. The identical backward chain on both frames

Takeda demodulation against the shared background, anchored 2-D
unwrap, edge-ring offset rectification, then onion-peeling inverse
Abel on the axial band — `n_e(r)` from each frame."""),
    C("""import os, sys
sys.path.insert(0, os.path.abspath("examples"))
# the chain itself, factored in the example (main() is __main__-guarded)
from experimental_shot_comparison import backward_chain"""),
    C("""r, ne_syn, ph_syn = backward_chain(H_syn, bkg, px_r, px_a, lwl)
_, ne_shot, ph_shot = backward_chain(aligned.data, bkg, px_r, px_a, lwl)
truth = ne0 * np.exp(-(r / w) ** 2)
keep = r < 2 * w
rel = lambda a, b: float(np.linalg.norm((a - b)[keep])
                         / np.linalg.norm(b[keep]))
print(f"density rel-L2 vs truth: twin {rel(ne_syn.astype(float), truth):.3f}, "
      f"shot {rel(ne_shot.astype(float), truth):.3f}")"""),
    M("""## 5. Overlay: profiles and radial densities

Left: the radial phase profile through the column midplane
(`Image.profile_line`, the reference's comparison primitive). Right:
recovered `n_e(r)` from both frames against the ground truth."""),
    C("""ph_syn_im = Image(ph_syn, mm_per_px=(px_a, px_r))
ph_shot_im = Image(ph_shot, mm_per_px=(px_a, px_r))
s_mm, p_syn = ph_syn_im.profile_line((0.0, -3.5), (0.0, 3.5))
_, p_shot = ph_shot_im.profile_line((0.0, -3.5), (0.0, 3.5))

fig, axs = plt.subplots(1, 2, figsize=(10, 3.4))
axs[0].plot(s_mm, p_syn, color=C_TWIN, lw=2, label="synthetic twin")
axs[0].plot(s_mm, p_shot, color=C_SHOT, lw=2, ls="--",
            label="registered shot")
axs[0].set_xlabel("distance along profile [mm]")
axs[0].set_ylabel("phase [rad]")
axs[0].legend(frameon=False)
axs[1].plot(r[keep]*1e3, truth[keep], color=C_TRUTH, lw=2,
            label="ground truth")
axs[1].plot(r[keep]*1e3, ne_syn[keep], color=C_TWIN, lw=2,
            label="from twin")
axs[1].plot(r[keep]*1e3, ne_shot[keep], color=C_SHOT, lw=2, ls="--",
            label="from shot")
axs[1].set_xlabel("r [mm]"); axs[1].set_ylabel(r"$n_e$ [m$^{-3}$]")
axs[1].legend(frameon=False)
for ax in axs:
    ax.spines[["top", "right"]].set_visible(False)
plt.tight_layout(); plt.show()"""),
    M("""The registered shot's density lands on the twin's to a few per
cent despite the rotation, walk-off and noise — the pose recovery and
the analysis chain, not luck. On a real campaign the same five steps
run unchanged with the camera frame in place of the manufactured
shot."""),
]

client = NotebookClient(nb, timeout=600)
client.execute()
nbf.write(nb, "notebooks/shot_comparison.ipynb")
print("written notebooks/shot_comparison.ipynb")
