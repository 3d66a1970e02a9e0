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
