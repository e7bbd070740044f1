"""Edge-list SpMM: sparse neighborhood aggregation without dense [B,N,N].

The dense banded-matmul path (``gcn_tpu.ops.gcn_layers``) is MXU-optimal for
sentence-sized graphs (N ≤ 128).  This module is the *scalable* aggregation
backend: messages are gathered per edge and scatter-added per node, so cost
is O(E·H) instead of O(N²·H) — the right shape for large batched forests and
for edge-partitioned execution across a device mesh (each device owns an
edge shard, partial aggregates are ``psum``-reduced; see
``gcn_tpu.parallel.edge_partition``).

Semantics are identical to the dense path and allclose-tested against it:

* ``spmm_forward``: out[b,p] += h[b,c] for each edge (p,c)   (A_f @ h)
* ``spmm_reverse``: out[b,c] += h[b,p] for each edge (p,c)   (A_fᵀ @ h)
* padded edge slots (mask 0) contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _scatter_rows(
    values: jax.Array,       # [B,E,H] per-edge messages (already masked)
    dst: jax.Array,          # [B,E] destination node index
    n: int,
) -> jax.Array:
    b, e, h = values.shape
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=dst.dtype)[:, None], dst.shape
    )
    out = jnp.zeros((b, n, h), values.dtype)
    return out.at[batch_idx, dst].add(values, mode="drop")


def spmm_forward(
    h: jax.Array,            # [B,N,H] node features
    edge_parent: jax.Array,  # [B,E]
    edge_child: jax.Array,   # [B,E]
    edge_mask: jax.Array,    # [B,E]
    gate: jax.Array | None = None,  # optional [B,N,H] sender gate (e ⊙ h)
    edge_weights: jax.Array | None = None,  # optional [B,E] per-edge scale
) -> jax.Array:
    """Aggregate child→parent messages: equivalent to ``A_f @ (gate*h)``
    (with ``A_f`` carrying ``edge_weights`` instead of 1s when given)."""
    src = gate * h if gate is not None else h
    msgs = jnp.take_along_axis(
        src, edge_child[:, :, None].astype(jnp.int32), axis=1
    )
    msgs = msgs * edge_mask[:, :, None].astype(src.dtype)
    if edge_weights is not None:
        msgs = msgs * edge_weights[:, :, None].astype(src.dtype)
    return _scatter_rows(msgs, edge_parent, h.shape[1])


def spmm_reverse(
    h: jax.Array,
    edge_parent: jax.Array,
    edge_child: jax.Array,
    edge_mask: jax.Array,
    gate: jax.Array | None = None,
    edge_weights: jax.Array | None = None,
) -> jax.Array:
    """Aggregate parent→child messages: equivalent to ``A_fᵀ @ (gate*h)``."""
    src = gate * h if gate is not None else h
    msgs = jnp.take_along_axis(
        src, edge_parent[:, :, None].astype(jnp.int32), axis=1
    )
    msgs = msgs * edge_mask[:, :, None].astype(src.dtype)
    if edge_weights is not None:
        msgs = msgs * edge_weights[:, :, None].astype(src.dtype)
    return _scatter_rows(msgs, edge_child, h.shape[1])


def node_degrees(
    edge_parent: jax.Array, edge_child: jax.Array, edge_mask: jax.Array,
    n: int, dtype=jnp.float32,
):
    """(deg_out, deg_in, incident) from an edge list — matches
    ``gcn_tpu.ops.adjacency.build_adjacency`` degrees."""
    b, e = edge_parent.shape
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, e))
    ones = edge_mask.astype(dtype)
    deg_out = jnp.zeros((b, n), dtype).at[batch_idx, edge_parent].add(
        ones, mode="drop"
    )
    deg_in = jnp.zeros((b, n), dtype).at[batch_idx, edge_child].add(
        ones, mode="drop"
    )
    incident = (deg_out + deg_in) > 0
    return deg_out, deg_in, incident
