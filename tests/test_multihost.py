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


_BASE_CLI = [
    "train.py", "--cpu", "--no-rnn",
    "--hidden_dim", "16", "--emb_dim", "300", "--batch_size", "10",
    "--effective_batch_size", "10", "--num_epoch", "2",
    "--seed", "7",
]


def _cli_env() -> dict:
    env = dict(os.environ, JAX_PLATFORMS="")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _logs(run_dir):
    with open(os.path.join(run_dir, "logs.txt")) as f:
        return [
            ln.split("\t") for ln in f.read().splitlines()
            if ln and not ln.startswith(("#", "new best"))
        ]


@pytest.fixture(scope="module")
def single_process_logs(tmp_path_factory):
    """Single-process baseline trajectory, trained once for the module."""
    root = tmp_path_factory.mktemp("sp")
    out = subprocess.run(
        [sys.executable] + _BASE_CLI
        + ["--id", "sp", "--model_save_dir", str(root)],
        capture_output=True, text=True, timeout=420, env=_cli_env(),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return _logs(os.path.join(root, "sp"))


@pytest.mark.slow
@pytest.mark.parametrize("mp_flags", [
    pytest.param([], id="packed"),  # pack_transfers defaults on: the
    # multi-host packed global-assembly path (one buffer per process)
    pytest.param(["--pack_transfers", "false"], id="plain"),
    pytest.param(["--steps_per_dispatch", "2"], id="chunked"),
])
def test_two_process_training_matches_single(
    tmp_path, mp_flags, single_process_logs
):
    """Actually TRAIN across 2 processes via the real CLI (the driver's
    multi-host path: MultiHostTrainer + ShardedBatcher + global batch
    assembly) and match the single-process loss trajectory — through the
    plain, packed-transfer and chunked-dispatch feeding paths."""
    base = [sys.executable] + _BASE_CLI
    env1 = _cli_env()

    # 2-process run
    port = free_port()
    procs = []
    for pid in range(2):
        env = dict(
            env1,
            GCN_TPU_COORDINATOR=f"localhost:{port}",
            GCN_TPU_NUM_PROCS="2",
            GCN_TPU_PROC_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            base + mp_flags
            + ["--id", "mp", "--model_save_dir", str(tmp_path / "mp")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    for p in procs:
        out2, err2 = p.communicate(timeout=420)
        assert p.returncode == 0, (err2[-2000:], out2[-500:])
        assert "Multi-host training" in out2
        assert "Training ended" in out2

    sp = single_process_logs
    mp = _logs(os.path.join(tmp_path, "mp", "mp"))
    assert len(sp) == len(mp) == 2
    for row_s, row_m in zip(sp, mp):
        # same epochs; train loss and dev F1 agree closely (identical
        # batches and RNG; only reduction order differs)
        assert row_s[0] == row_m[0]
        assert abs(float(row_s[1]) - float(row_m[1])) < 1e-3 * max(
            1.0, abs(float(row_s[1]))
        ), (row_s, row_m)
        assert abs(float(row_s[3]) - float(row_m[3])) < 1e-6, (row_s, row_m)
    # only process 0 writes artifacts; checkpoints exist and load
    assert os.path.isdir(os.path.join(tmp_path, "mp", "mp", "best_model"))


@pytest.mark.slow
def test_two_process_halo_training_matches_single(
    tmp_path, single_process_logs
):
    """Multi-host halo: 2 processes × 2 virtual devices, mesh
    (data=2, model=2), graph_partition=halo — the memory-scaling mode over
    a process boundary (the DCN analog; SURVEY §2b row 6).  The halo
    aggregate is numerically the dense aggregate, so the loss trajectory
    must match the plain single-process baseline; plan arrays are built on
    the global batch by the wrapped batcher, sliced per process
    (ShardedBatcher), and reassembled with their own (model, data)
    layout (data.sharding.global_batch_from_local + parallel.halo
    plan_spec)."""
    port = free_port()
    procs = []
    for pid in range(2):
        env = dict(
            _cli_env(),
            GCN_TPU_COORDINATOR=f"localhost:{port}",
            GCN_TPU_NUM_PROCS="2",
            GCN_TPU_PROC_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable] + _BASE_CLI
            + ["--graph_partition", "halo", "--graph_axis", "2",
               "--id", "mph", "--model_save_dir", str(tmp_path / "mph")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    for p in procs:
        out2, err2 = p.communicate(timeout=420)
        assert p.returncode == 0, (err2[-2000:], out2[-500:])
        assert "Multi-host training" in out2
        assert "Training ended" in out2

    sp = single_process_logs
    mp = _logs(os.path.join(tmp_path, "mph", "mph"))
    assert len(sp) == len(mp) == 2
    for row_s, row_m in zip(sp, mp):
        assert row_s[0] == row_m[0]
        assert abs(float(row_s[1]) - float(row_m[1])) < 1e-3 * max(
            1.0, abs(float(row_s[1]))
        ), (row_s, row_m)
        assert abs(float(row_s[3]) - float(row_m[3])) < 1e-6, (row_s, row_m)
