"""Driver contracts: bench.py's JSON line and __graft_entry__'s surface."""

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_DIM"] = "16"
    env["BENCH_RAYS"] = "1000"
    out = subprocess.run([sys.executable, os.path.join(_ROOT, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=300, cwd=_ROOT)
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, out.stdout + out.stderr[-500:]
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] > 0
    assert rec["unit"] == "rays/s"


def test_graft_entry_surface():
    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn) and isinstance(args, tuple)
    import jax

    out = jax.jit(fn)(*args)
    assert out.shape == (80, 108)
    g.dryrun_multichip(min(8, len(jax.devices())))
