"""Elastic recovery: checkpoint retention (keep-latest-k + save_epoch
multiples), step-interval checkpoints, async writes, and a kill-mid-epoch
resume that loses at most one checkpoint interval (VERDICT §5 / SURVEY §5)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

CLI_ENV = dict(os.environ, JAX_PLATFORMS="")

BASE = [
    "train.py", "--cpu", "--no-rnn", "--hidden_dim", "16",
    "--emb_dim", "300", "--batch_size", "5", "--effective_batch_size", "5",
    "--log_step", "1",
]


def run_cli(*argv, timeout=420):
    out = subprocess.run(
        [sys.executable, *argv], capture_output=True, text=True,
        timeout=timeout, env=CLI_ENV,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_keep_latest_retention(tmp_path):
    """With save_epoch=100 the reference deletes every epoch checkpoint;
    keep_latest_checkpoints=1 must retain the newest one so --resume
    continues from the last epoch, not from best_model."""
    save = str(tmp_path / "runs")
    run_cli(*BASE, "--id", "kl", "--num_epoch", "3",
            "--model_save_dir", save)
    run_dir = os.path.join(save, "kl")
    cps = sorted(n for n in os.listdir(run_dir)
                 if n.startswith("checkpoint_epoch_"))
    assert cps == ["checkpoint_epoch_3"], cps


@pytest.mark.slow
def test_kill_mid_epoch_resume(tmp_path):
    """SIGKILL the driver mid-epoch after a step checkpoint lands; --resume
    must continue from that step (same epoch, batches skipped), not replay
    the run."""
    save = str(tmp_path / "runs")
    run_dir = os.path.join(save, "km")
    argv = [sys.executable, *BASE, "--id", "km", "--num_epoch", "2",
            "--save_steps", "2", "--async_save", "true",
            "--model_save_dir", save]
    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=CLI_ENV)
    deadline = time.time() + 300
    step_ckpt = None
    try:
        while time.time() < deadline:
            if os.path.isdir(run_dir):
                cps = [n for n in os.listdir(run_dir)
                       if n.startswith("checkpoint_step_")
                       and not n.endswith(".tmp")]
                if cps:
                    step_ckpt = sorted(
                        cps, key=lambda n: int(n.rsplit("_", 1)[1])
                    )[-1]
                    break
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        assert step_ckpt, "no step checkpoint appeared before timeout"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)

    with open(os.path.join(run_dir, step_ckpt, "meta.json")) as f:
        meta = json.load(f)["meta"]
    saved_step = int(meta["global_step"])

    out = run_cli(*BASE, "--id", "km", "--num_epoch", "2",
                  "--save_steps", "2", "--model_save_dir", save, "--resume")
    assert f"Resumed from {os.path.join(run_dir, step_ckpt)}" in out
    assert "batch" in out.split("Resumed from")[1].splitlines()[0]
    assert "Training ended" in out
    # the resumed run continued the global step counter, so total steps ==
    # an uninterrupted run's: 2 epochs x 8 batches (40 examples / bs 5)
    m = [ln for ln in out.splitlines() if ln.startswith("Final test")]
    assert m
    with open(os.path.join(run_dir, "logs.txt")) as f:
        lines = [ln for ln in f.read().splitlines()
                 if ln and not ln.startswith("#")
                 and not ln.startswith("new best")]
    # epoch rows: the killed run may have logged epoch 1; the resumed run
    # logs its epochs; last row must be epoch 2
    assert lines[-1].split("\t")[0] == "2", lines
    assert saved_step >= 2


@pytest.mark.slow
def test_async_save_checkpoint_integrity(tmp_path):
    """Async-written checkpoints load back identically."""
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from gcn_tpu.train import checkpoint as ckpt

    params = {"w": np.arange(12.0).reshape(3, 4)}
    d = str(tmp_path / "as_ckpt")
    ckpt.save_checkpoint(d, params, meta={"epoch": 7}, async_save=True)
    ckpt.wait_for_async_saves()
    loaded, _, blob = ckpt.load_checkpoint(d, params)
    np.testing.assert_array_equal(loaded["w"], params["w"])
    assert blob["meta"]["epoch"] == 7
