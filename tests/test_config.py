"""Flag registry and trace-config units."""

import pytest

from synthpy_tpu.config import Flags, TraceConfig, flags


def test_flags_registry():
    f = Flags(A=1, B=False)
    assert f["A"] == 1
    f.update("B", True)
    assert f.get("B") is True
    with pytest.raises(KeyError):
        f.update("missing", 0)
    f.register("C", "x")
    with pytest.raises(KeyError):
        f.register("C", "y")
    f.reset("B")
    assert f["B"] is False
    f.update("A", 99)
    f.reset_all()
    assert f.as_dict() == {"A": 1, "B": False, "C": "x"}


def test_global_flags_have_reference_keys():
    for key in ("MEMORY_DEBUG", "JITTED", "PARALLELISED", "SEEDED",
                "JAX_INITIALISED"):
        assert key in flags.as_dict()


def test_trace_config_hashable():
    c = TraceConfig(steps_per_cell=2.0)
    assert hash(c) == hash(TraceConfig(steps_per_cell=2.0))


def test_jax_init_subprocess():
    """jax_init must configure env before jax import (reference
    config.py:73-154 semantics); run in a clean subprocess."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from synthpy_tpu.config import jax_init, flags\n"
        "jax_init(force_device='cpu', core_limit=4)\n"
        "assert os.environ['OMP_NUM_THREADS'] == '1'\n"
        "assert '--xla_force_host_platform_device_count=4' in "
        "os.environ['XLA_FLAGS']\n"
        "assert flags['JAX_INITIALISED']\n"
        "import jax\n"
        "assert len(jax.devices()) == 4\n"
        "print('OK')\n"
    ) % (__import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__))),)
    import os

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
                        "XLA_FLAGS", "PYTHONPATH")}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "OK" in out.stdout, out.stderr[-500:]
