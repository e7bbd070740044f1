"""Simulated multi-host: two OS processes under jax.distributed on CPU,
exercising initialization, sharded data loading, global-array assembly and
a cross-process collective (SURVEY.md §4's multiprocess-CPU requirement)."""

import os
import socket
import subprocess
import sys

import pytest


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed():
    port = free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            GCN_TPU_COORDINATOR=f"localhost:{port}",
            GCN_TPU_NUM_PROCS="2",
            GCN_TPU_PROC_ID=str(pid),
            JAX_PLATFORMS="",
        )
        env.pop("XLA_FLAGS", None)  # no virtual-device override here
        # prevent the axon sitecustomize from initializing the backend at
        # interpreter startup — distributed init must come first
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "tools/multihost_worker.py"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    checksums = set()
    for out in outs:
        line = [ln for ln in out.splitlines() if "MULTIHOST_OK" in ln]
        assert line, out
        checksums.add(line[0].split("checksum=")[1])
    assert len(checksums) == 1  # both processes agree on the global sum
