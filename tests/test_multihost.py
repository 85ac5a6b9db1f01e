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


def _run_once():
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
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    return procs, outs


def test_two_process_global_mesh():
    procs, outs = _run_once()
    if any(p.returncode == -9 for p in procs):
        # SIGKILL = host OOM-killer under concurrent load, not a product
        # failure mode (the workers are plain jax processes); retry once
        # before judging.
        procs, outs = _run_once()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
