"""Multi-diagnostic pipeline: one trace, many benches — equal to singles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthpy_tpu import pipeline
from synthpy_tpu.fields import ScalarDomain
from synthpy_tpu.tracer import init_beam

EXT = 5e-3


@pytest.fixture(scope="module")
def scene():
    d = ScalarDomain(2 * EXT, 33).test_lens(ne_0=5e24, LR=1.5e-3)
    d.phaseshift = True
    s0 = init_beam(jax.random.PRNGKey(0), 4000, 1.5e-3, 0.0, EXT, "circular")
    return d, s0


@pytest.mark.parametrize("solver", ["zscan_seg", "zscan", "time"])
def test_multi_matches_single(scene, solver):
    d, s0 = scene
    names = ("shadowgraphy", "schlieren_df", "interferometry")
    multi = pipeline.run(d, s0, solver=solver, bins=(32, 24),
                         diagnostic=list(names), seg_K=8)
    assert set(multi) == set(names)
    for name in names:
        single = pipeline.run(d, s0, solver=solver, bins=(32, 24),
                              diagnostic=name, seg_K=8)
        np.testing.assert_array_equal(np.asarray(multi[name]),
                                      np.asarray(single))


def test_multi_mixed_coherence_shapes(scene):
    d, s0 = scene
    out = pipeline.run(d, s0, bins=(32, 24), seg_K=8,
                       diagnostic=("shadowgraphy", "refractometry_coherent"))
    assert np.asarray(out["shadowgraphy"]).shape == (24, 32)
    # coherent detector uses bins+1 EDGES -> same (ny, nx) pixel grid
    assert np.asarray(out["refractometry_coherent"]).shape == (24, 32)
    assert np.isfinite(np.abs(np.asarray(out["refractometry_coherent"]))).all()
