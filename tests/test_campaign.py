"""Campaign runner: chunked accumulation with checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import RegularGridInterpolator as ScipyRGI

from synthpy_tpu.campaign import run_campaign
from synthpy_tpu.ops.interp import trilinear_nonuniform


def _chunk_fn_factory(calls):
    def chunk_fn(key, k):
        calls.append(k)
        x = jax.random.uniform(key, (100,)) * 10 - 5
        H = jnp.zeros((4,)).at[jnp.clip(((x + 5) / 2.5).astype(int),
                                        0, 3)].add(1.0)
        return {"H": H}
    return chunk_fn


def test_campaign_accumulates_and_resumes(tmp_path):
    ck = str(tmp_path / "state.npz")
    key = jax.random.PRNGKey(0)

    calls = []
    full = run_campaign(_chunk_fn_factory(calls), total_rays=500,
                        chunk_rays=100, key=key)
    assert calls == [0, 1, 2, 3, 4]
    assert full["H"].sum() == 500

    # run only 2 chunks by "crashing": simulate by checkpointing per chunk
    calls2 = []
    fn = _chunk_fn_factory(calls2)

    def crashing_fn(k_key, k):
        if k == 2:
            raise RuntimeError("simulated crash")
        return fn(k_key, k)

    try:
        run_campaign(crashing_fn, 500, 100, key, checkpoint_path=ck)
    except RuntimeError:
        pass
    assert calls2 == [0, 1]

    # resume completes the remaining chunks and matches the full run
    calls3 = []
    resumed = run_campaign(_chunk_fn_factory(calls3), 500, 100, key,
                           checkpoint_path=ck)
    assert calls3 == [2, 3, 4]
    np.testing.assert_allclose(resumed["H"], full["H"])


def test_trilinear_nonuniform_matches_scipy():
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.uniform(0.5, 1.5, 12)); x -= x[0]
    y = np.cumsum(rng.uniform(0.2, 2.0, 9)); y -= y[0]
    z = np.cumsum(rng.uniform(0.1, 1.0, 7)); z -= z[0]
    vals = rng.normal(size=(12, 9, 7))
    pts = np.stack([rng.uniform(-1, x[-1] + 1, 4000),
                    rng.uniform(-1, y[-1] + 1, 4000),
                    rng.uniform(-1, z[-1] + 1, 4000)], axis=1)
    ref = ScipyRGI((x, y, z), vals, bounds_error=False, fill_value=0.0)(pts)
    got = trilinear_nonuniform(
        (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)),
        jnp.asarray(vals, jnp.float32), jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-5)
