"""Differentiable diagnostics: gradient correctness + parameter recovery.

The reference cannot do any of this (scipy solve_ivp + NaN-killed optics
+ histogram2d are all derivative-free); it is the payoff of the
functional jax design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.inverse import cic_image, make_renderer
from synthpy_tpu.tracer import init_beam

EXT = 5e-3


def _lens_profile(dims, ne_0=5e24, LR=1.5e-3):
    d = ScalarDomain(2 * EXT, dims).test_lens(ne_0=ne_0, LR=LR)
    return d, d.ne / ne_0   # unit-amplitude profile


def test_cic_image_matches_histogram_totals():
    x = jnp.array([0.0, 1.0, -2.0, 100.0])   # last ray off-detector
    y = jnp.array([0.0, -1.0, 2.0, 0.0])
    w = jnp.ones(4)
    H = cic_image(x, y, w, (16, 12), 18.0, 13.5)
    np.testing.assert_allclose(float(H.sum()), 3.0, rtol=1e-6)


def test_render_gradient_matches_finite_difference():
    d, profile = _lens_profile(21)
    s0 = init_beam(jax.random.PRNGKey(5), 800, 2e-3, 0.0, EXT, "circular")
    render = make_renderer(d, s0, bins=(24, 18), K=4)

    target = render(5e24 * profile)

    def loss(amp):
        img = render(amp * profile)
        return jnp.mean((img - target) ** 2)

    amp0 = 4e24
    g = jax.grad(loss)(amp0)
    eps = 1e20
    fd = (loss(amp0 + eps) - loss(amp0 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_inverse_recovers_lens_amplitude():
    """Gradient descent on the rendered shadowgram recovers the density
    amplitude from a 25% mis-initialisation."""
    d, profile = _lens_profile(21)
    s0 = init_beam(jax.random.PRNGKey(6), 1500, 2e-3, 0.0, EXT, "circular")
    render = make_renderer(d, s0, bins=(24, 18), K=4)

    true_amp = 5e24
    target = render(true_amp * profile)

    def loss(log_amp):
        img = render(jnp.exp(log_amp) * profile)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    theta = jnp.log(jnp.asarray(0.75 * true_amp))
    lr = 0.5
    l0 = None
    for _ in range(40):
        l, g = vg(theta)
        if l0 is None:
            l0 = l
        theta = theta - lr * g / (jnp.abs(g) + 1e-30) * jnp.minimum(
            jnp.abs(g) * 1e3, 0.05)   # clipped signed step in log space
    rec = float(jnp.exp(theta))
    assert float(l) < 0.25 * float(l0)
    assert abs(rec - true_amp) / true_amp < 0.08


def test_weighted_stages_match_nan_filtered_histogram():
    """The weighted optics path produces the same shadowgram totals as the
    production NaN-filter + histogram pipeline."""
    from synthpy_tpu import pipeline

    d, profile = _lens_profile(25)
    s0 = init_beam(jax.random.PRNGKey(8), 3000, 2e-3, 0.0, EXT, "circular")
    render = make_renderer(d, s0, bins=(54, 40), K=8)
    H_diff = np.asarray(render(jnp.asarray(d.ne)))
    H_ref = np.asarray(pipeline.run(d, s0, solver="zscan_seg", seg_K=8,
                                    bins=(54, 40)))
    # same accepted-ray total (CIC spreads sub-pixel, so compare sums and
    # coarse structure, not per-pixel equality)
    np.testing.assert_allclose(H_diff.sum(), H_ref.sum(), rtol=1e-6)
    # centre-of-mass agreement to a tenth of a pixel
    iy, ix = np.indices(H_ref.shape)
    for A, B in ((H_diff, H_ref),):
        for w in (iy, ix):
            ca = (A * w).sum() / A.sum()
            cb = (B * w).sum() / B.sum()
            assert abs(ca - cb) < 0.5


def test_weighted_filters_match_rtm_kill_semantics():
    """Weighted aperture/stop/rect/knife keep exactly the rays the
    production rtm filters keep (rect keeps the corner-clip parity quirk,
    knife honors (offset, axis, direction) ordering)."""
    from synthpy_tpu.inverse import apply_stages_weighted
    from synthpy_tpu.optics import rtm

    k = jax.random.PRNGKey(9)
    r = jax.random.normal(k, (4, 256)) * 20.0
    cases = [
        [("aperture", 10.0)],
        [("stop", 5.0)],
        [("rect", 8.0, 12.0)],
        [("knife", 1.0, "x", 1)],
        [("knife", -2.0, "y", -1)],
    ]
    kills = [
        lambda rr: rtm.circular_aperture(rr, 10.0),
        lambda rr: rtm.circular_stop(rr, 5.0),
        lambda rr: rtm.rect_aperture(rr, 8.0, 12.0),
        lambda rr: rtm.knife_edge(rr, 1.0, "x", 1),
        lambda rr: rtm.knife_edge(rr, -2.0, "y", -1),
    ]
    for stages, kill in zip(cases, kills):
        _, w = apply_stages_weighted(r, stages)
        survived_ref = np.isfinite(np.asarray(kill(r))[0])
        np.testing.assert_array_equal(np.asarray(w) > 0, survived_ref,
                                      err_msg=str(stages))


def test_cic_edge_deposits_partial_weight():
    """A ray whose CIC cloud half-overlaps the detector edge deposits
    half its weight (true CIC), and off-edge motion has nonzero gradient."""
    Lx, Ly, bins = 16.0, 16.0, (16, 16)
    dx = Lx / bins[0]
    # pixel-centre coord tx = -0.5 -> x = -Lx/2
    x_edge = jnp.array([-Lx / 2])
    y_mid = jnp.array([0.0])
    H = cic_image(x_edge, y_mid, jnp.ones(1), bins, Lx, Ly)
    np.testing.assert_allclose(float(H.sum()), 0.5, rtol=1e-6)
    g = jax.grad(lambda x: cic_image(jnp.atleast_1d(x), y_mid,
                                     jnp.ones(1), bins, Lx, Ly).sum())(
        -Lx / 2 + 0.01)
    assert np.isfinite(float(g)) and float(g) != 0.0
    assert dx > 0  # geometry sanity


def test_coherent_renderer_produces_fringes_and_gradients():
    """Interferometry through the differentiable path: the rendered
    interferogram shows the carrier fringes, and its gradient w.r.t. the
    density amplitude is finite, nonzero, and matches finite differences
    (phase-sensitivity the incoherent path cannot provide)."""
    d = ScalarDomain(2 * EXT, 21)
    d.phaseshift = True
    X = d.x[:, None, None]
    Y = d.y[None, :, None]
    ones = jnp.ones(d.dims)

    def ne_field(amp):
        return amp * jnp.exp(-(X**2 + Y**2) / (1.5e-3) ** 2) * ones

    d.ne = ne_field(5e24)
    s0 = init_beam(jax.random.PRNGKey(13), 6000, 2e-3, 0.0, EXT, "circular")
    render = make_renderer(d, s0, diagnostic="interferometry",
                           bins=(48, 36), K=4)

    img0 = np.asarray(render(ne_field(0.0)))      # background fringes
    assert np.isfinite(img0).all() and img0.sum() > 0
    # carrier fringes: strong modulation along the tilt direction
    prof = img0.sum(axis=0)
    assert prof.max() > 2.0 * max(prof.mean(), 1e-12)

    target = render(ne_field(5e24))

    def loss(amp):
        return jnp.mean((render(ne_field(amp)) - target) ** 2)

    amp0 = 4e24
    g = jax.grad(loss)(amp0)
    eps = 1e20
    fd = (loss(amp0 + eps) - loss(amp0 - eps)) / (2 * eps)
    assert np.isfinite(float(g)) and float(g) != 0.0
    # central differences of an OSCILLATORY f32 fringe image are noisy
    # (the incoherent path matches to 2%, test above); require sign and
    # magnitude agreement rather than tight equality
    np.testing.assert_allclose(float(g), float(fd), rtol=0.3)


def test_remat_gradients_match_plain_gradients():
    """Segment-granularity jax.checkpoint (remat=True, the default)
    changes memory, not math: gradients match the unrematerialized
    chain."""
    d, profile = _lens_profile(21)
    s0 = init_beam(jax.random.PRNGKey(23), 400, 2e-3, 0.0, EXT, "circular")
    r_remat = make_renderer(d, s0, bins=(24, 18), K=4, remat=True)
    r_plain = make_renderer(d, s0, bins=(24, 18), K=4, remat=False)

    target = r_plain(5e24 * profile)

    def loss(render, amp):
        return jnp.mean((render(amp * profile) - target) ** 2)

    g1 = jax.grad(lambda a: loss(r_remat, a))(4e24)
    g2 = jax.grad(lambda a: loss(r_plain, a))(4e24)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-6)


def test_phase_map_bench_linear_zeroed_and_differentiable():
    """The phase_map bench is ~linear in ne (phase is a line integral),
    zero on unsampled pixels, and its masked-MSE gradient is finite —
    including the sliver-weight pixels at the beam edge that a naive
    eps-guarded division turns into inf*0=NaN."""
    d, prof = _lens_profile(33)
    d.phaseshift = True
    ne0 = 5e23 * prof
    s0 = init_beam(jax.random.PRNGKey(3), 4000, 2e-3, 0.0, EXT,
                   "circular")
    render = make_renderer(d, s0, diagnostic="phase_map", bins=(48, 36),
                           K=8)
    P1 = np.asarray(render(ne0))
    P2 = np.asarray(render(2.0 * ne0))
    assert P1.min() < -0.05          # plasma phase is negative
    m = np.abs(P1) > 0.05 * np.abs(P1).max()
    # ~linear: doubling ne doubles almost every sampled pixel's phase
    # (edge pixels whose ray SET changes with the deflections may
    # deviate — that's physics, not the detector)
    ratio = P2[m] / P1[m]
    assert abs(np.median(ratio) - 2.0) < 0.02
    assert np.mean(np.abs(ratio - 2.0) < 0.2) > 0.95
    # corners far outside the beam footprint deposit nothing -> exact 0
    assert P1[0, 0] == 0.0 and P1[-1, -1] == 0.0

    mask = jnp.asarray(m)

    def loss(ne):
        P = render(ne)
        return jnp.sum(mask * (P - jnp.asarray(P1)) ** 2)

    g = jax.grad(loss)(1.5 * ne0)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0


def test_phase_map_requires_phaseshift_and_bench_kwargs_reach_stages():
    """phase_map without domain.phaseshift raises; bench_kwargs thread
    per-bench stage-builder overrides (a schlieren stop small enough to
    pass deflected rays turns an all-blocked image into signal)."""
    d, prof = _lens_profile(33)
    s0 = init_beam(jax.random.PRNGKey(3), 4000, 2e-3, 0.0, EXT,
                   "circular")
    with pytest.raises(ValueError, match="phase"):
        make_renderer(d, s0, diagnostic="phase_map", bins=(32, 24))

    ne0 = 2e23 * prof   # weak deflections: default 1 mm stop blocks all
    blocked = make_renderer(d, s0, diagnostic="schlieren_df",
                            bins=(32, 24), K=8)
    open_ = make_renderer(d, s0, diagnostic="schlieren_df",
                          bins=(32, 24), K=8,
                          bench_kwargs={"schlieren_df":
                                        {"stop_R": 0.05}})
    assert float(jnp.abs(blocked(ne0)).max()) == 0.0
    assert float(jnp.abs(open_(ne0)).max()) > 0.0


def test_multiview_sees_probing_axis_structure():
    """Tomographic complementarity of make_multiview_renderers.

    A parallel view's phase map is a projection along its probing axis:
    two fields differing ONLY by a blob offset along z produce (nearly)
    identical z-view phase maps — the single-view degeneracy that capped
    round-3 inversion at rel_l2_full ~0.87 — while the x-view separates
    them at full signal amplitude. This is the forward-model fact the
    multi-view tomography example (examples/inverse_tomography_multiview
    .py) exploits; here it gates the helper's per-view geometry wiring
    (probing_direction copies, per-view beams, shared ne argument).
    """
    from synthpy_tpu.inverse import make_multiview_renderers

    dim = 17
    d = ScalarDomain(2 * EXT, dim, phaseshift=True)
    x = np.asarray(d.x)[:, None, None]
    y = np.asarray(d.y)[None, :, None]
    z = np.asarray(d.z)[None, None, :]

    def blob(z0):
        return jnp.asarray(5e23 * np.exp(
            -(x**2 + y**2 + (z - z0) ** 2) / (1.5e-3) ** 2))

    g_hi, g_lo = blob(+1.2e-3), blob(-1.2e-3)

    key = jax.random.PRNGKey(0)
    beams = {v: init_beam(jax.random.fold_in(key, i), 8000, 3.2e-3,
                          0.0, EXT, "circular", probing_direction=v)
             for i, v in enumerate(("z", "x"))}
    renders = make_multiview_renderers(
        d, beams, diagnostic="phase_map", bins=(24, 24), K=4,
        Lx=8.0, Ly=8.0)

    dz = {v: float(jnp.abs(renders[v](g_hi) - renders[v](g_lo)).max())
          for v in renders}
    scale = float(jnp.abs(renders["z"](g_hi)).max())
    assert scale > 1.0                       # a few-radian phase object
    assert dz["z"] < 0.01 * scale            # z-view blind to z offset
    assert dz["x"] > 0.5 * scale             # x-view localises it
