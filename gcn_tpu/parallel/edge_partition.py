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


def partitioned_attention_layer(
    mesh: Mesh,
    q: jax.Array,            # [B,N,Dk] destination projections (scaled)
    k: jax.Array,            # [B,N,Dk] source projections
    hw: jax.Array,           # [B,N,H] value projections
    edge_parent: jax.Array,  # [B,E] — E divisible by axis size
    edge_child: jax.Array,
    edge_mask: jax.Array,
    axis: str = "model",
    data_axis: str | None = None,
) -> jax.Array:
    """BOTH attention bands (``adj_type=attention``) with edges sharded
    over ``axis`` and the edge-softmax normalized ACROSS shards.

    Per-edge scores ``q[dst]·k[src]`` are local to each edge shard; the
    softmax normalizer is per *destination node*, whose incoming edges
    may live on any shard — so each band's per-node running max is
    combined with one ``pmax`` and its exp-sum denominator with one
    ``psum`` (both [B,N] — the cross-shard edge-softmax lifting the
    round-3 partition exclusion at models/gcn.py).  The forward band
    (dst=parent, A_f) and reverse band (dst=child, A_fᵀ) are computed in
    ONE shard_map and their local partial aggregates summed BEFORE the
    single [B,N,H] psum — the dominant cross-shard collective is paid
    once per layer, not once per band.  Numerics are identical to
    ``ops.pallas.sddmm.edge_softmax`` (max-shifted, masked): the global
    max over shard-local maxima IS the per-node max.
    """
    da = data_axis if (
        data_axis is not None and dict(mesh.shape).get(data_axis, 1) > 1
    ) else None
    n = q.shape[1]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(da, None, None),      # q, k, hw replicated over the axis
            P(da, None, None),
            P(da, None, None),
            P(da, axis),            # edge arrays sharded on E
            P(da, axis),
            P(da, axis),
        ),
        out_specs=P(da, None, None),
        check_vma=False,
    )
    def run(q_l, k_l, hw_l, ep, ec, em):
        b = ep.shape[0]
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], ep.shape)
        neg = jnp.asarray(-1e30, jnp.float32)

        def band(reverse: bool):
            dst, src = (ec, ep) if reverse else (ep, ec)
            di = dst.astype(jnp.int32)
            qd = jnp.take_along_axis(q_l, di[:, :, None], axis=1)
            ks = jnp.take_along_axis(
                k_l, src[:, :, None].astype(jnp.int32), axis=1)
            s = jnp.sum(qd * ks, axis=-1).astype(jnp.float32)  # [B, E/K]
            sm = jnp.where(em, s, neg)
            # the softmax shift is gradient-free (its contribution
            # cancels); stop_gradient also sidesteps pmax's missing VJP
            m_loc = jnp.full((b, n), neg, s.dtype).at[bidx, di].max(
                jax.lax.stop_gradient(sm), mode="drop")
            m_glob = jax.lax.stop_gradient(jax.lax.pmax(m_loc, axis))
            ex = jnp.where(
                em, jnp.exp(sm - jnp.take_along_axis(m_glob, di, axis=1)),
                jnp.zeros((), s.dtype))
            den_loc = jnp.zeros((b, n), s.dtype).at[bidx, di].add(
                ex, mode="drop")
            den = jax.lax.psum(den_loc, axis)
            alpha = ex / jnp.maximum(
                jnp.take_along_axis(den, di, axis=1), 1e-30)
            op = spmm_reverse if reverse else spmm_forward
            return op(hw_l, ep, ec, em,
                      edge_weights=alpha.astype(hw_l.dtype))

        return jax.lax.psum(band(False) + band(True), axis)

    return run(q, k, hw, edge_parent, edge_child, edge_mask)


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
