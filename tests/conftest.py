"""Test bootstrap: simulate an 8-device TPU-style mesh on CPU.

This formalises the reference's laptop-testing pattern
(--xla_force_host_platform_device_count, reference src/simulator/
config.py:108) as the standard way to unit-test sharding without real
multi-chip hardware.

Note: the host environment may import jax at interpreter startup (TPU
sitecustomize), so the platform is switched via jax.config rather than env
vars. XLA_FLAGS is still honoured because the CPU client is only
instantiated on first use, which happens after this file runs.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of how pytest was invoked.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
