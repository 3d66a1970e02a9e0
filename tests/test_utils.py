"""Utility helpers: formatting, memory estimates, plotting smoke tests."""

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np

from synthpy_tpu.utils import (
    add_integer_postfix,
    base_ray_plot,
    domain_estimate,
    heat_plot,
    key_from_seed,
    mem_conversion,
    round_to_n,
)


def test_mem_conversion():
    assert mem_conversion(512) == "512.00 B"
    assert mem_conversion(2048) == "2.00 KB"
    assert mem_conversion(3 * 1024**3) == "3.00 GB"


def test_domain_estimate():
    assert domain_estimate((128, 128, 128)) == 128**3 * 4
    assert domain_estimate((8, 8, 8), channels=3) == 512 * 12


def test_round_and_postfix():
    assert round_to_n(123456, 2) == 120000
    assert round_to_n(0, 3) == 0.0
    assert add_integer_postfix(1) == "1st"
    assert add_integer_postfix(2) == "2nd"
    assert add_integer_postfix(3) == "3rd"
    assert add_integer_postfix(4) == "4th"
    assert add_integer_postfix(11) == "11th"
    assert add_integer_postfix(21) == "21st"


def test_key_from_seed():
    k = key_from_seed(42)
    assert k.shape == (2,)
    k2 = key_from_seed(None)
    assert k2.shape == (2,)


def test_plot_helpers_smoke():
    rng = np.random.default_rng(0)
    rf = rng.normal(size=(4, 500)) * 1e-3
    base_ray_plot(rf, nbins=21)
    heat_plot(np.ones((8, 10)), extent=(0, 1, 0, 1))


def test_beam_save_rays(tmp_path):
    from synthpy_tpu.tracer import Beam

    b = Beam(32, 1e-3, 0.0, 5e-3, seed=0)
    f = str(tmp_path / "rays.npy")
    b.save_rays_pos(f)
    arr = np.load(f)
    assert arr.shape == (9, 32)
