"""Multi-host data sharding.

New surface (the reference is single-process, SURVEY.md §2b): in a
multi-host ``jax.distributed`` job every process loads the dataset and
iterates only its own slice of each global batch; the sharded train step
reassembles the global batch across the ``data`` mesh axis via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from gcn_tpu.data.dataset import Batcher


class ShardedBatcher:
    """Wraps a Batcher, yielding this process's rows of each batch.

    The global batch of B rows is split evenly over ``num_processes``; the
    underlying Batcher must be built with ``batch_size`` divisible by the
    process count (batch-axis padding guarantees equal shapes).
    """

    def __init__(
        self,
        batcher: Batcher,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.batcher = batcher
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        assert batcher.batch_size % self.process_count == 0, (
            f"batch size {batcher.batch_size} not divisible by "
            f"{self.process_count} processes"
        )
        self.local_rows = batcher.batch_size // self.process_count

    def gold(self):
        return self.batcher.gold()

    @property
    def order(self):
        return self.batcher.order

    def __len__(self) -> int:
        return len(self.batcher)

    @property
    def halo_devices(self) -> int:
        return self.batcher.halo_devices

    @halo_devices.setter
    def halo_devices(self, value: int) -> None:
        # the driver sets this on whichever batcher it holds; plans are
        # built by the WRAPPED batcher (on the global batch, cached per
        # chunk) and sliced per process below
        self.batcher.halo_devices = value

    def _slice(self, batch: dict) -> dict:
        lo = self.process_index * self.local_rows
        hi = lo + self.local_rows

        def cut(k: str, v):
            if k.startswith("hplan_"):
                # halo plan arrays put the batch dim AFTER the device
                # dim(s): requests/request_mask are [K, K, B, Hp], edge
                # lists [K, B, E].  Plans are per-example, so slicing B
                # is exact (gcn_tpu.parallel.halo layout contract).
                if v.ndim == 4:
                    return v[:, :, lo:hi]
                return v[:, lo:hi]
            return v[lo:hi]

        return {k: cut(k, v) for k, v in batch.items()}

    def __iter__(self) -> Iterator[dict]:
        for batch in self.batcher:
            yield self._slice(batch)


def global_batch_from_local(mesh, batch: dict, data_axis: str = "data"):
    """Assemble per-process local batches into global sharded arrays
    (multi-host path of the sharded train step).  Halo plan arrays keep
    their own layout — device dim on ``model``, batch dim on ``data``
    (``parallel.halo.plan_spec``); every other leaf shards its leading
    batch axis over ``data``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcn_tpu.parallel.halo import is_plan_key, plan_spec

    out = {}
    for k, v in batch.items():
        if is_plan_key(k):
            spec = plan_spec(k, np.ndim(v), data_axis=data_axis)
        else:
            spec = P(data_axis, *([None] * (np.ndim(v) - 1)))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(v)
        )
    return out
