"""Build + execute notebooks/inverse_diagnostics.ipynb (CPU, ~3 min)."""
import nbformat as nbf
from nbclient import NotebookClient

nb = nbf.v4.new_notebook()
C = nbf.v4.new_code_cell
M = nbf.v4.new_markdown_cell

nb.cells = [
    M("""# Differentiable diagnostics: inverting a shadowgram

The whole forward model — density grid → gradient pack → segmented RK
march → ABCD optics → cloud-in-cell detector — is one smooth `jnp`
chain (`synthpy_tpu.inverse`), so `jax.grad` turns a synthetic
diagnostic into a *measurement operator*: given a target image, gradient
descent recovers the plasma parameters that produced it. The reference
architecture (scipy `solve_ivp`, NaN-killed optics, `histogram2d`) has
no derivative path.
"""),
    C("""import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")   # demo runs anywhere
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import make_renderer
from synthpy_tpu.tracer import init_beam

EXT, DIM = 5e-3, 25
domain = ScalarDomain(2 * EXT, DIM)
X = domain.x[:, None, None]; Y = domain.y[None, :, None]
ones = jnp.ones(domain.dims)

def ne_field(amp, LR):
    return amp * jnp.exp(-(X**2 + Y**2) / LR**2) * ones

domain.ne = ne_field(5e24, 1.5e-3)
s0 = init_beam(jax.random.PRNGKey(0), 8000, 2e-3, 0.0, EXT, "circular")
render = make_renderer(domain, s0, bins=(48, 36), K=8)"""),
    M("""## The "experiment"

A shadowgram from the TRUE parameters — this plays the role of the
measured detector image."""),
    C("""true_amp, true_LR = 5e24, 1.5e-3
target = render(ne_field(true_amp, true_LR))
plt.imshow(np.asarray(target), cmap="gray"); plt.title("target shadowgram")
plt.colorbar(); plt.savefig("/tmp/nb_target.png", dpi=60); plt.close()
print("target sum:", float(target.sum()))"""),
    M("""## Inversion

Start 2x off in amplitude and 67% off in radius; descend on the image
mismatch. Both parameters are positive scales, so optimise in log
space."""),
    C("""def loss_fn(theta):
    img = render(ne_field(jnp.exp(theta[0]), jnp.exp(theta[1])))
    return jnp.mean((img - target) ** 2)

vg = jax.jit(jax.value_and_grad(loss_fn))
theta = jnp.array([jnp.log(2.5e24), jnp.log(2.5e-3)])
history = []
for it in range(40):
    loss, g = vg(theta)
    theta = theta - 2e-2 * g / (jnp.linalg.norm(g) + 1e-30)
    history.append(float(loss))
amp, LR = float(jnp.exp(theta[0])), float(jnp.exp(theta[1]))
print(f"recovered amp {amp:.3e} (true {true_amp:.1e}, "
      f"{100*abs(amp-true_amp)/true_amp:.1f}% off)")
print(f"recovered LR  {LR*1e3:.3f} mm (true {true_LR*1e3:.1f}, "
      f"{100*abs(LR-true_LR)/true_LR:.1f}% off)")"""),
    C("""plt.semilogy(history); plt.xlabel("iteration"); plt.ylabel("loss")
plt.title("image-space loss"); plt.savefig("/tmp/nb_loss.png", dpi=60)
plt.close()
assert history[-1] < 0.3 * history[0]"""),
    M("""## Phase sensitivity: coherent benches

The same machinery carries the Jones vector through phase-checkpointed
optics and deposits $|\\sum E|^2$ — an interferogram whose gradient
w.r.t. the density is the *phase* derivative (line-integrated density),
complementary to the shadowgraphy (second-derivative) signal."""),
    C("""domain.phaseshift = True
render_i = make_renderer(domain, s0, diagnostic="interferometry",
                         bins=(48, 36), K=8)
fringes = render_i(ne_field(0.0, 1.5e-3))
g = jax.grad(lambda a: jnp.mean(
    (render_i(ne_field(a, 1.5e-3))
     - render_i(ne_field(5e24, 1.5e-3))) ** 2))(4e24)
print("background fringe contrast:",
      float(fringes.max() / max(float(fringes.mean()), 1e-12)))
print("d(loss)/d(amp):", float(g), "(finite, nonzero ->",
      bool(np.isfinite(float(g)) and float(g) != 0.0), ")")"""),
]

client = NotebookClient(nb, timeout=1200, kernel_name="python3")
client.execute()
nbf.write(nb, "/root/repo/notebooks/inverse_diagnostics.ipynb")
print("notebook executed + written")
