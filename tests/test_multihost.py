"""Two-process CPU smoke test of the multi-host stream-sharding recipe.

SURVEY.md §2.9 (ICI/DCN row): the DCN-scale story is `jax.distributed` over
N hosts with the ``stream`` mesh axis spanning hosts.  This launches
``tests/multihost_worker.py`` twice (2 virtual CPU devices each -> a
4-device global mesh), exactly as the documented recipe in
``ofps_tpu/parallel/distributed.py`` prescribes, and requires both
processes to assemble the global batch and agree on a cross-host jitted
reduction.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"
_REPO = Path(__file__).resolve().parent.parent

# Env vars that must not leak into the workers (tunneled-TPU plumbing would
# break CPU multiprocess init; see __graft_entry__ scrubbing).
_KEEP = (
    "PATH", "HOME", "LANG", "LC_ALL", "PYTHONHASHSEED", "TMPDIR",
    "LD_LIBRARY_PATH",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(port: int, pid: int, tmp: Path) -> dict:
    env = {k: v for k, v in os.environ.items() if k in _KEEP}
    env["PYTHONPATH"] = str(_REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp / f"cache{pid}")
    env["OFPS_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
    env["OFPS_TPU_NUM_PROCESSES"] = "2"
    env["OFPS_TPU_PROCESS_ID"] = str(pid)
    return env


def test_two_process_stream_mesh(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER)],
            env=_worker_env(port, pid, tmp_path),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(_REPO),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {pid}\n{out}"
    # Both processes agree on the same global reduction.
    totals = {
        line.split("total=")[1]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    }
    assert len(totals) == 1, totals
