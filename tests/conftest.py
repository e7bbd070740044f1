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

# Persistent XLA compilation cache for SUBPROCESS tests only (CLI
# round-trips, elastic kill/resume, 2-process multihost): those were the
# slowest suite entries because every child recompiled its programs cold
# (test_drivers' partition-vs-DP test alone was 62 s); each child is a
# short-lived fresh process and has never crashed on the cache.
#
# The MAIN pytest process deliberately does NOT use the persistent cache:
# XLA:CPU's executable (de)serialization is not reliable late in a
# long-lived many-program process — four full-suite runs died inside
# compilation_cache (SIGSEGV in backend.deserialize_executable; after
# disabling reads, SIGABRT in the serialize/write path), always while
# test_warmup compiled its donating fused-step programs, single-threaded,
# while the same entries (de)serialize fine in a fresh process.
# In-process reuse is covered by jax's in-memory jit cache anyway; a
# mid-run config toggle cannot opt a single module out because
# compilation_cache.is_cache_used memoizes its decision per process.
_CACHE_DIR = os.environ.get(
    "GCN_TPU_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
if _CACHE_DIR:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                          "-1")
    # the env vars above affect only CHILD processes: the axon
    # sitecustomize/jax read them at import, but this process was already
    # imported without them taking effect for jax.config — and we do NOT
    # set jax_compilation_cache_dir here on purpose (see above)
    jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test"
    )


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDEN_DIR


def load_golden(name: str) -> dict:
    path = os.path.join(GOLDEN_DIR, name)
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
