"""Trace-time mesh context for shard-local regrouping.

The factored full_deprel path sorts tokens by relation id over the
flattened batch (``ops.gcn_layers.make_group_plan``).  Under GSPMD data
sharding a *global* argsort is a cross-device sort — XLA inserts
all-to-all style resharding for an op whose result is then immediately
un-sorted, i.e. pure wasted ICI bandwidth: the grouped transform is
row-local math (sort → matmul → un-sort cancels), so each data shard can
group **its own rows** with zero communication.

This module carries the active mesh from the trainer into the ops layer
(which must not depend on ``gcn_tpu.parallel``).  When a context is
active, ``make_group_plan``/``grouped_bilinear`` run inside ``shard_map``
over the data axis: local argsort, local grouped matmul, local un-sort.
Gradients flow through ``shard_map`` unchanged; the cotangent of the
replicated composed matrices is the usual psum that GSPMD would emit for
the data-parallel gradient anyway.

The context is read at *trace* time (inside jitted function bodies), so
each trainer instance's jit cache is keyed consistently: plain ``Trainer``
never sets it, ``DistributedTrainer`` always does.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

_ctx: contextvars.ContextVar = contextvars.ContextVar(
    "gcn_tpu_grouping_mesh", default=None
)


@contextlib.contextmanager
def local_grouping(mesh, data_axis: str = "data",
                   model_axis: Optional[str] = "model"):
    """Activate shard-local grouping over ``mesh``'s ``data_axis``.

    No-op when ``mesh`` is None or every mesh axis has a single shard (the
    single-device trainer and all host-side tooling stay on the plain
    path).  A model-only mesh (data=1, model>1) still activates: the
    grouped-bilinear/persistent-LSTM Mosaic kernels must run inside
    shard_map whenever the surrounding jit is GSPMD-partitioned at all —
    "Mosaic kernels cannot be automatically partitioned".
    """
    sizes = dict(mesh.shape) if mesh is not None else {}
    if mesh is None or all(s <= 1 for s in sizes.values()):
        yield
        return
    token = _ctx.set((mesh, data_axis, model_axis))
    try:
        yield
    finally:
        _ctx.reset(token)


def active_grouping():
    """(mesh, data_axis, model_axis) when a context is active, else None."""
    return _ctx.get()


# --------------------------------------------------------- graph partition
# Trace-time context that routes the model's neighborhood aggregation
# through the partition-parallel operators (parallel.edge_partition /
# parallel.halo) over the mesh's ``model`` axis.  Same design as
# ``local_grouping``: the trainer owns the mesh; the model reads the
# context at trace time so each trainer's jit cache is keyed consistently.

_part_ctx: contextvars.ContextVar = contextvars.ContextVar(
    "gcn_tpu_partition_mesh", default=None
)


@contextlib.contextmanager
def graph_partition(mode: str, mesh, axis: str = "model",
                    data_axis: Optional[str] = "data"):
    """Activate partition-parallel aggregation ``mode`` ("edges"|"halo")
    over ``mesh``'s ``axis``.  No-op when mode is "none"/falsy, mesh is
    None, or the axis has a single shard (the partitioned operators would
    only add overhead there — the dense path is identical math)."""
    if (not mode or mode == "none" or mesh is None
            or dict(mesh.shape).get(axis, 1) <= 1):
        yield
        return
    if mode not in ("edges", "halo"):
        raise ValueError(f"unknown graph_partition mode: {mode!r}")
    token = _part_ctx.set((mode, mesh, axis, data_axis))
    try:
        yield
    finally:
        _part_ctx.reset(token)


def active_partition():
    """(mode, mesh, axis, data_axis) when a partition context is active,
    else None."""
    return _part_ctx.get()
