"""Build + execute notebooks/xray_and_abel.ipynb (CPU, ~2 min)."""
import nbformat as nbf
from nbclient import NotebookClient

nb = nbf.v4.new_notebook()
C = nbf.v4.new_code_cell
M = nbf.v4.new_markdown_cell

nb.cells = [
    M("""# X-ray radiography and the Abel analysis loop

Two workflows the optical benches don't cover:

1. **X-ray transport imaging** (`synthpy_tpu.optics.xray`) —
   PROPACEOS-style (T, ρ) opacity tables drive straight-line
   Beer–Lambert radiographs (parallel-beam and magnified
   point-projection) and grey-body self-emission images. keV X-rays
   are undeflected, so each image is one batched trilinear gather +
   reduction — no ray ODE.
2. **Inverse Abel analysis** (`synthpy_tpu.analysis.abel`) — the
   experimental chain from an interferogram back to density: Takeda
   demodulation → unwrap → phase-to-line-density → onion-peeling
   inverse Abel, all as batched linear algebra.
"""),
    C("""import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")   # demo runs anywhere
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
"""),
    M("""## 1. A rippled liner, imaged three ways

Dense cold shell (with a GRF perturbation seed) around a hot dilute
core. A Kramers-like opacity κ ∝ T^-1.5 ρ^0.5 is sampled onto a
log–log table first, exactly like an experimental PROPACEOS file, then
consumed through `make_opacity_lookup` (log-bilinear: exact on power
laws)."""),
    C("""from synthpy_tpu.fields.grf import grf_domain_fft, power_law
from synthpy_tpu.optics.xray import (make_opacity_lookup,
    attenuation_image, point_projection_radiograph,
    self_emission_image, grey_emissivity)

res, half = 64, 2.5e-3
ax = np.linspace(-half, half, res).astype(np.float32)
X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
_, ripple = grf_domain_fft(jax.random.PRNGKey(7), power_law(-11/3),
                           l_max=2e-3, l_min=3e-4, extent=half,
                           res=res // 2)
ripple = np.asarray(ripple)[:res, :res, :res]
r_cyl = np.sqrt(X**2 + Z**2)
r0 = 1.4e-3 * (1 + 0.12 * ripple)
shell = np.exp(-((r_cyl - r0) / 2.5e-4) ** 2)
core = np.exp(-(r_cyl / 8e-4) ** 2)
rho = (0.5 * shell + 1e-2 * core).astype(np.float32)   # g/cm^3
Te = (15.0 + 485.0 * core).astype(np.float32)          # eV

T_grid = np.logspace(0, 3, 30)
rho_grid = np.logspace(-5, 1, 40)
table = 5e3 * np.outer(T_grid**-1.5, rho_grid**0.5)
kfn = make_opacity_lookup(T_grid, rho_grid, table)

ds = float(ax[1] - ax[0])
trans = np.asarray(attenuation_image(rho, Te, kfn, ds, "y"))
emiss = np.asarray(self_emission_image(rho, Te, grey_emissivity(kfn),
                                       ds, "y"))
pp = np.asarray(point_projection_radiograph(
    rho, Te, kfn, [jnp.asarray(ax)] * 3, 8e-3, 80e-3,
    bins=(215, 160), Lx=90.0, Ly=67.0, n_steps=96,
    probing_direction="y"))
print("min transmission:", trans.min(), "| point-projection:", pp.min())
"""),
    C("""fig, axs = plt.subplots(1, 3, figsize=(13, 4))
axs[0].imshow(trans.T, cmap="gray", origin="lower")
axs[0].set_title("parallel-beam transmission")
axs[1].imshow(pp.T, cmap="gray", origin="lower")
axs[1].set_title("point-projection (M ≈ 8.9)")
axs[2].imshow(np.log10(emiss.T + emiss.max() * 1e-6), origin="lower")
axs[2].set_title("self-emission (log)")
fig.tight_layout()
"""),
    M("""The shadow of the rippled shell dominates both radiographs
(magnified in the point-projection one), while the self-emission image
lights up only the hot core — the classic complementary pair.

## 2. Interferogram → phase → Abel → n_e(r)

Forward: trace a cylindrical Gaussian plasma column with phase
accumulation and render a Mach–Zehnder interferogram + background.
Backward: exactly what one runs on camera frames."""),
    C("""from synthpy_tpu.analysis.abel import invert_phase_map
from synthpy_tpu.analysis.fringes import (phase_difference,
    rectify_phase_offset, unwrap_2d)
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.optics import Interferometry
from synthpy_tpu.tracer import init_beam
from synthpy_tpu.tracer.zscan import solve_zscan

ext, lwl, bs = 5e-3, 1064e-9, 8
dim, rays, ne0, w = 49, 400_000, 1e24, 2e-3
d = ScalarDomain(2 * ext, dim)
Yg, Zg = jnp.meshgrid(d.y, d.z, indexing="ij")
d.external_ne(jnp.broadcast_to(
    (ne0 * jnp.exp(-(Yg**2 + Zg**2) / w**2))[None], (dim,) * 3))
d.phaseshift = True
s0 = init_beam(jax.random.PRNGKey(0), rays, 4.5e-3, 0.0, ext, "circular")
res_t = solve_zscan(s0, d, return_E=True, lwl=lwl)
it = Interferometry(lwl, res_t.rf, res_t.Jf)
it.two_lens_solve(n_fringes=40, deg=20)
H = np.asarray(it.interferogram(bin_scale=bs))
bkg = np.asarray(it.bkg(n_fringes=40, deg=20, bin_scale=bs))
"""),
    C("""wrapped = phase_difference(H, bkg)
ny, nx = wrapped.shape        # (y, x): rows are the RADIAL direction
px_r, px_a = 13.5 / ny, 18.0 / nx
ir, ia = int(4.2 / px_r), int(4.2 / px_a)
crop = wrapped[ny//2 - ir:ny//2 + ir, nx//2 - ia:nx//2 + ia]
uw = unwrap_2d(crop, anchor=(ir, ia))
yy = (np.arange(crop.shape[0]) - ir) * px_r
ring = (np.abs(yy) > 3.5) & (np.abs(yy) < 4.0)   # fringes, ~no plasma
uw = rectify_phase_offset(uw, np.tile(ring[:, None], (1, crop.shape[1])))

xs = (np.arange(crop.shape[1]) - ia) * px_a
rows = uw.T[np.abs(xs) < 1.0]
if np.median(rows[:, ir-4:ir+4]) > 0:   # Takeda sideband sign ambiguity
    rows = -rows
ne_r = np.asarray(invert_phase_map(rows, px_r * 1e-3, lwl,
                                   axis_index=ir, reg=5e-3))
ne_mean = ne_r.mean(axis=0)
r = (np.arange(ne_mean.shape[0]) + 0.5) * px_r * 1e-3
truth = ne0 * np.exp(-(r / w) ** 2)
keep = r < 2 * w
rel_l2 = np.linalg.norm(ne_mean[keep] - truth[keep]) / np.linalg.norm(truth[keep])
print(f"rel_l2 of recovered profile: {rel_l2:.3f}")
"""),
    C("""fig, axs = plt.subplots(1, 3, figsize=(13, 3.6))
axs[0].imshow(H, cmap="gray", aspect="auto"); axs[0].set_title("interferogram")
im = axs[1].imshow(uw, aspect="auto"); axs[1].set_title("unwrapped phase [rad]")
fig.colorbar(im, ax=axs[1])
axs[2].plot(r * 1e3, truth, "k-", label="truth")
axs[2].plot(r * 1e3, ne_mean, "C1.", ms=3, label="recovered")
axs[2].set_xlabel("r [mm]"); axs[2].set_ylabel("$n_e$ [m$^{-3}$]")
axs[2].legend(); axs[2].set_title("Abel-inverted profile")
fig.tight_layout()
"""),
    M("""Closing this loop to a few percent proves the renderer and the
analysis stack agree about phase sign, wavelength scaling and detector
geometry — the trust one needs before running the same backward chain
on experimental frames. `tests/test_analysis_loop.py` gates it in CI;
`examples/interferogram_to_density.py` is the full-size script."""),
]

client = NotebookClient(nb, timeout=900)
client.execute()
nbf.write(nb, "notebooks/xray_and_abel.ipynb")
print("wrote notebooks/xray_and_abel.ipynb")
