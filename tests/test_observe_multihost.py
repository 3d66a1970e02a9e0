"""Observability helpers and single-process multihost logic."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from synthpy_tpu import observe
from synthpy_tpu.parallel import multihost, ray_mesh


def test_timer_sections():
    t = observe.Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        pass
    assert t.times["a"] >= 0
    assert "a:" in t.report()


def test_device_memory_profile(tmp_path):
    path = observe.save_device_memory_profile(str(tmp_path), 64, 1000)
    assert os.path.exists(path)
    assert "memory-domain64_rays1000-" in os.path.basename(path)


def test_device_memory_stats_shape():
    stats = observe.device_memory_stats()
    assert isinstance(stats, dict)  # CPU devices may report nothing


def test_checking_leaks_context():
    with observe.checking_leaks():
        _ = jnp.ones(3) * 2


def test_multihost_single_process():
    multihost.initialize()
    start, count = multihost.local_ray_slice(1000)
    assert (start, count) == (0, 1000)
    k1 = multihost.host_local_beam_key(jax.random.PRNGKey(0))
    assert k1.shape == (2,)


def test_global_ray_array_roundtrip():
    mesh = ray_mesh()
    local = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    arr = multihost.global_ray_array(local, mesh)
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(local))


def test_parse_hpc_error():
    from synthpy_tpu.utils import parse_hpc_error, strip_ansi

    assert strip_ansi("\x1b[31mred\x1b[0m plain") == "red plain"
    wrapped = ('header\n{"log": "Traceback (most recent call last):\\n  '
               'File x\\nValueError: boom"}\nfooter')
    out = parse_hpc_error(wrapped)
    assert "ValueError: boom" in out and "\\n" not in out


def test_multihost_two_process_cpu():
    """Real two-process jax.distributed cluster on CPU: initialize() wires
    both ranks (env-free explicit coordinator), global arrays assemble
    across processes, and a cross-process reduction returns the right sum.
    Replaces the reference's mpiexec wiring (simTraceMPI.sh:14)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=180)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "WORKER_OK 0" in outs[0]
    assert "WORKER_OK 1" in outs[1]


def test_multihost_initialize_noop_without_env(monkeypatch):
    """No coordinator arg + no cluster env vars -> initialize leaves jax
    alone (and performs no backend query on the decision path)."""
    for v in multihost._DIST_ENV_VARS + ("TPU_WORKER_HOSTNAMES",):
        monkeypatch.delenv(v, raising=False)
    multihost.initialize()  # must not raise, must not connect
    from jax._src import distributed as _dist

    assert _dist.global_state.client is None


def test_memprof_parses_real_dump(tmp_path):
    """Write a real jax device-memory profile, then parse it with the
    dependency-free pprof reader and the reference-named directory scan
    (memory_plots.py equivalent)."""
    _ = jnp.zeros((256, 256))  # ensure something is allocated
    path = observe.save_device_memory_profile(str(tmp_path), 128, 4096)
    from synthpy_tpu.analysis import memprof

    info = memprof.parse_prof(path)
    assert info["n_samples"] >= 0 and info["sample_types"]
    mb = memprof.total_mb(path)
    assert mb >= 0.0

    recs = memprof.summarize_dir(str(tmp_path))
    assert len(recs) == 1
    assert recs[0]["domain"] == 128 and recs[0]["rays"] == 4096
    assert recs[0]["memory_mb"] == mb
