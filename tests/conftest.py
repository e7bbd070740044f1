"""Test configuration: force JAX onto a virtual 8-device CPU platform.

The axon sitecustomize registers a tunneled single-chip TPU backend and sets
``jax_platforms`` programmatically, so the env var alone is not enough — we
override via ``jax.config`` before any computation runs.  Eight host devices
let the sharding tests exercise real meshes without TPU hardware
(SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache shared across test runs/workers: the
# suite is compile-bound on small CPUs (hundreds of distinct programs), and
# a warm cache cuts `make test` wall time by a large factor.  Keyed by
# config+HLO, so stale entries are never wrongly reused; delete the
# directory to force cold compiles.  Exported to the environment so
# SUBPROCESS tests (CLI round-trips, elastic kill/resume, 2-process
# multihost) inherit it — they were the slowest suite entries because
# every child recompiled its programs cold.
#
# NB: the warmup-trajectory check runs in its own subprocess
# (test_warmup.py) — its back-to-back donating-program compile burst,
# issued ~240 tests into a long-lived process, crashed XLA:CPU in four
# distinct single-threaded ways (with and without this cache); see
# docs/design.md §8b.  No other test has ever tripped that fragility.
_CACHE_DIR = os.environ.get(
    "GCN_TPU_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
if _CACHE_DIR:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                          "-1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test"
    )


# Files whose tests dominate the suite's wall time (subprocess CLI runs,
# 2-process multihost, 8-device dryruns).  Scheduling them FIRST shortens
# xdist's critical path: with alphabetical collection they landed at the
# end, and whichever worker drew the last 20-second test set the `-n 2`
# wall (~330 s vs the 294 s ideal split).
_FRONTLOAD = ("test_multihost", "test_drivers", "test_elastic",
              "test_parallel", "test_halo", "test_warmup")


def pytest_collection_modifyitems(config, items):
    items.sort(key=lambda it: 0 if any(
        f in it.nodeid for f in _FRONTLOAD) else 1)


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDEN_DIR


def load_golden(name: str) -> dict:
    path = os.path.join(GOLDEN_DIR, name)
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
