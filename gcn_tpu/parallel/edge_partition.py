"""Edge-partitioned (graph-parallel) aggregation via shard_map.

The GNN analog of sequence/context parallelism (SURVEY.md §5): the batched
dependency forest's *edge list* is sharded across the ``model`` mesh axis.
Each device scatter-aggregates the messages of its local edge shard into a
full node-feature buffer, and a single ``psum`` over the axis combines the
partial aggregates — boundary-node exchange rides ICI as one fused
collective, overlapped by XLA with the local compute.

Node features stay replicated across the axis (sentence graphs are small;
the savings target is edge bandwidth and scatter throughput, which dominate
for large forests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gcn_tpu.ops.spmm import spmm_forward, spmm_reverse


def partitioned_aggregate(
    mesh: Mesh,
    h: jax.Array,            # [B,N,H] node features (replicated over axis)
    edge_parent: jax.Array,  # [B,E] — E divisible by axis size
    edge_child: jax.Array,
    edge_mask: jax.Array,
    reverse: bool = False,
    axis: str = "model",
    data_axis: str | None = None,
) -> jax.Array:
    """``A_f @ h`` (or ``A_fᵀ @ h``) with edges sharded over ``axis``.

    ``data_axis`` co-shards the batch dimension so the operator composes
    with data parallelism on a (data × model) mesh without GSPMD inserting
    an all-gather over ``data`` around the shard_map.
    """

    op = spmm_reverse if reverse else spmm_forward
    da = data_axis if (
        data_axis is not None and dict(mesh.shape).get(data_axis, 1) > 1
    ) else None

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(da, None, None),      # h replicated over the model axis
            P(da, axis),            # edge arrays sharded on E
            P(da, axis),
            P(da, axis),
        ),
        out_specs=P(da, None, None),
        check_vma=False,
    )
    def run(h_local, ep, ec, em):
        partial_agg = op(h_local, ep, ec, em)
        return jax.lax.psum(partial_agg, axis)

    return run(h, edge_parent, edge_child, edge_mask)


def pad_edges_for_axis(batch: dict, axis_size: int) -> dict:
    """Pad the edge dimension so it divides the mesh axis size."""
    e = batch["edge_parent"].shape[1]
    pad = (-e) % axis_size
    if pad == 0:
        return batch
    out = dict(batch)
    for k in ("edge_parent", "edge_child", "edge_deprel", "edge_mask"):
        arr = batch[k]
        out[k] = jnp.pad(arr, ((0, 0), (0, pad)))
    return out
