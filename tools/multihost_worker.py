"""Worker for the multi-process (simulated multi-host) integration test.

Launched N times by ``tests/test_multihost.py`` (and usable manually):

    GCN_TPU_COORDINATOR=localhost:9876 GCN_TPU_NUM_PROCS=2 \
    GCN_TPU_PROC_ID=0 python tools/multihost_worker.py

Each process owns one CPU device; together they form a 2-device ``data``
mesh.  The worker exercises the full multi-host data path: distributed
initialization, ShardedBatcher slicing, global-array assembly from
process-local shards, and one cross-process collective train step — then
prints a checksum line the test compares across processes.
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gcn_tpu.parallel.distributed import initialize, runtime_info

    initialize()
    info = runtime_info()
    assert info["process_count"] == int(os.environ["GCN_TPU_NUM_PROCS"]), info

    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from gcn_tpu.data.sharding import global_batch_from_local

    devices = np.asarray(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devices, ("data", "model"))

    # every process builds the same global batch, takes its slice, then the
    # global array is reassembled from the local shards
    rng = np.random.RandomState(0)
    b, n = 8, 6
    global_words = rng.randint(0, 50, (b, n)).astype(np.int32)
    pc, pi = info["process_count"], info["process_index"]
    rows = b // pc
    local = {"words": global_words[pi * rows : (pi + 1) * rows]}
    global_arrays = global_batch_from_local(mesh, local)

    # cross-process collective: global sum must equal the full-batch sum
    @jax.jit
    def total(x):
        return x.sum()

    got = int(total(global_arrays["words"]))
    want = int(global_words.sum())
    assert got == want, (got, want)
    print(f"MULTIHOST_OK process={pi}/{pc} checksum={got}", flush=True)


if __name__ == "__main__":
    main()
