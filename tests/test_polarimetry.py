"""Faraday polarimetry diagnostic: analyser-weighted detector.

Beyond-reference bench (the reference computes Faraday rotation into the
pol channel, full_solver.py:532-541, but ships no polarimeter): images
the bundle through the M = 1 telescope with a per-ray analyser weight
amp^2 cos^2(pol + beta). Gated against the closed-form uniform-field
rotation and for exactness of batch sums.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import constants, pipeline
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.optics import Polarimetry
from synthpy_tpu.tracer import init_beam, solve_zscan_analytic

EXT = 5e-3
LWL = 1064e-9
NE, BZ = 1e24, 10.0


def _uniform_faraday_domain(Bz=BZ):
    dom = ScalarDomain(2 * EXT, 33, B_on=True)
    dom.analytic = {
        "ne": lambda x, y, z: NE + 0.0 * (x + y + z),
        "B": lambda x, y, z: (jnp.zeros_like(x), jnp.zeros_like(x),
                              Bz + 0.0 * x),
    }
    return dom


def _pol_exact(Bz=BZ):
    return float(constants.verdet_constant(LWL) * NE * Bz * 2 * EXT)


def test_uniform_rotation_matches_malus_law():
    dom = _uniform_faraday_domain()
    s0 = init_beam(jax.random.PRNGKey(0), 20000, 2e-3, 0.0, EXT, "circular")
    Hs = pipeline.run(dom, s0, solver="analytic", diagnostic="shadowgraphy",
                      bins=(61, 41), critical_guard=None)
    Hp = pipeline.run(dom, s0, solver="analytic", diagnostic="polarimetry",
                      bins=(61, 41), critical_guard=None, pol_beta_deg=85.0)
    expect = math.cos(_pol_exact() + math.radians(85.0)) ** 2
    assert float(Hp.sum() / Hs.sum()) == pytest.approx(expect, rel=1e-4)


def test_signed_sensitivity_near_extinction():
    """Opposite B fields give distinguishable polarograms at beta != 90,
    and identical ones through a perfectly crossed analyser's symmetry."""
    s0 = init_beam(jax.random.PRNGKey(1), 5000, 2e-3, 0.0, EXT, "circular")
    sums = {}
    for Bz in (BZ, -BZ):
        dom = _uniform_faraday_domain(Bz)
        H = pipeline.run(dom, s0, solver="analytic",
                         diagnostic="polarimetry", bins=(31, 21),
                         critical_guard=None, pol_beta_deg=85.0)
        sums[Bz] = float(H.sum())
    # cos^2(beta + pol) vs cos^2(beta - pol) differ off extinction
    assert abs(sums[BZ] - sums[-BZ]) / max(sums.values()) > 0.5


def test_polarimetry_class_matches_pipeline():
    dom = _uniform_faraday_domain()
    s0 = init_beam(jax.random.PRNGKey(0), 8000, 2e-3, 0.0, EXT, "circular")
    Hp = pipeline.run(dom, s0, solver="analytic", diagnostic="polarimetry",
                      bins=(431, 321), critical_guard=None,
                      pol_beta_deg=85.0)
    res = solve_zscan_analytic(s0, dom, return_E=True)
    d = Polarimetry(LWL, res.rf, res.Jf)
    d.solve()
    H = d.polarogram(beta_deg=85.0, bin_scale=8)
    assert float(jnp.asarray(Hp).sum()) == pytest.approx(
        float(jnp.asarray(H).sum()), rel=1e-5)


def test_polarimetry_gridded_solver_agrees_with_analytic():
    """The same Faraday domain as GRIDS through zscan_seg agrees with the
    analytic closed-form path at the detector-sum level."""
    dim = 33
    dom = _uniform_faraday_domain()
    domg = ScalarDomain(2 * EXT, dim, B_on=True)
    ne = np.full((dim, dim, dim), NE, np.float32)
    B = np.zeros((dim, dim, dim, 3), np.float32)
    B[..., 2] = BZ
    domg.external_ne(ne)
    domg.external_B(B)
    s0 = init_beam(jax.random.PRNGKey(2), 8000, 2e-3, 0.0, EXT, "circular")
    Ha = pipeline.run(dom, s0, solver="analytic", diagnostic="polarimetry",
                      bins=(31, 21), critical_guard=None)
    Hg = pipeline.run(domg, s0, solver="zscan_seg", diagnostic="polarimetry",
                      bins=(31, 21), critical_guard=None)
    assert float(Hg.sum()) == pytest.approx(float(Ha.sum()), rel=2e-2)


def test_polarogram_batch_sums_are_exact():
    """Linear-in-rays detector: batch-summed == single program."""
    dom = _uniform_faraday_domain()
    s0 = init_beam(jax.random.PRNGKey(3), 4000, 2e-3, 0.0, EXT, "circular")
    H1 = pipeline.run(dom, s0, solver="analytic", diagnostic="polarimetry",
                      bins=(31, 21), critical_guard=None)
    H2 = (pipeline.run(dom, s0[:, :2000], solver="analytic",
                       diagnostic="polarimetry", bins=(31, 21),
                       critical_guard=None)
          + pipeline.run(dom, s0[:, 2000:], solver="analytic",
                         diagnostic="polarimetry", bins=(31, 21),
                         critical_guard=None))
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), atol=1e-4)


def test_polarogram_requires_jones():
    d = Polarimetry(LWL, jnp.zeros((4, 8)))
    with pytest.raises(RuntimeError, match="Jones"):
        d.polarogram()


def test_differentiable_faraday_rendering():
    """make_renderer('polarimetry') gives a usable ne gradient: pol
    depends on ne through Verdet*ne*B, so polarograms constrain ne given
    a known B (Faraday inversion). Gradients are checked in scaled units
    (per-unit-ne SI gradients are ~1e-24 and their squared norms
    underflow f32)."""
    from synthpy_tpu.inverse import make_renderer

    dim = 17
    dom = ScalarDomain(2 * EXT, dim, B_on=True)
    ne = np.full((dim,) * 3, NE, np.float32)
    B = np.zeros((*([dim] * 3), 3), np.float32)
    B[..., 2] = BZ
    dom.external_ne(ne)
    dom.external_B(B)
    s0 = init_beam(jax.random.PRNGKey(0), 3000, 2e-3, 0.0, EXT, "circular")
    render = make_renderer(dom, s0, diagnostic="polarimetry",
                           bins=(16, 12), K=8)
    target = render(jnp.asarray(ne) * 1.3)

    def loss(scale):
        return jnp.mean((render(scale * NE) - target) ** 2)

    ones = jnp.ones((dim,) * 3, jnp.float32)
    g = jax.grad(loss)(ones)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 1e-7
    # a descent step along -sign(g) reduces the loss
    assert float(loss(ones - 1e-3 * jnp.sign(g))) < float(loss(ones))
