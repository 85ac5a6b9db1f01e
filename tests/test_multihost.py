"""Multi-host SPMD (SURVEY §2.3 DP row, multi-process column): two real
processes, 4 virtual CPU devices each, one global 8-device mesh — per-host
input sharding and cross-process eval-log gather must work end to end."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_once(timeout):
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs, timed_out = [], False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            timed_out = True  # our own kill produces returncode -9 below
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    return procs, outs, timed_out


def test_two_process_global_mesh():
    """Deflaked (round 4): the historical SIGKILL flake was this test's OWN
    timeout kill — a cold XLA compile on this 1-core host under concurrent
    load can exceed the subprocess timeout (the worker now shares the
    suite's persistent compilation cache, so only the first-ever run is
    cold). Retries are deterministic: 3 attempts with escalating timeouts,
    only for timeout/SIGKILL outcomes (real assertion failures surface
    immediately)."""
    attempts = []
    for timeout in (480, 720, 960):
        procs, outs, timed_out = _run_once(timeout)
        codes = [p.returncode for p in procs]
        attempts.append((codes, timed_out))
        if not timed_out and all(c != -9 for c in codes):
            break
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {rank} failed (attempts: {attempts}):\n{out[-3000:]}"
        )
        assert "MULTIHOST_OK" in out, out[-3000:]
