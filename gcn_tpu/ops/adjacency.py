"""On-device adjacency construction from edge lists.

The reference builds a dense ``[B,N,N]`` deprel-valued adjacency on the host
for every forward pass (``model/gcn.py:102-112``).  Here the host ships only
padded edge lists; a single batched scatter reconstructs the forward band on
device, and every derived quantity (reverse band, self-loop diagonal, degree
denominator, pooling mask) comes from it — all inside the jit program, so XLA
fuses the whole thing with the first GCN layer.

Band semantics (reference ``model/tree.py:184-192`` + ``model/gcn.py:260-262``):

* forward band:  ``A_f[b, p, c] = 1``  for each tree edge parent→child,
* reverse band:  ``A_f``ᵀ,
* self-loop diagonal: nodes incident to ≥1 edge,
* ``denom = deg_fwd + deg_rev + has_self_loop + 1``  (the ``+1`` is the
  reference's unconditional ``adj.sum(2)+1`` over the combined 0/1 matrix),
* pooling mask: tokens with **no** incident edge (pruned-away + padding) are
  excluded from sentence pooling (reference ``model/gcn.py:262``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Adjacency(NamedTuple):
    forward: jax.Array   # [B,N,N] float — parent→child band (0/1)
    incident: jax.Array  # [B,N] bool — node touches ≥1 edge (self-loop set)
    denom: jax.Array     # [B,N,1] float — degree normalizer (deg+1)
    pool_mask: jax.Array # [B,N] bool — True = EXCLUDE from sentence pooling

    @property
    def reverse(self) -> jax.Array:
        return jnp.swapaxes(self.forward, 1, 2)

    @property
    def combined(self) -> jax.Array:
        """0/1 matrix of forward+reverse+self-loop — the reference's
        ``adj_matrix`` (``model/gcn.py:260``)."""
        eye = jnp.eye(self.forward.shape[-1], dtype=self.forward.dtype)
        diag = self.incident.astype(self.forward.dtype)[:, :, None] * eye
        return self.forward + self.reverse + diag


def build_adjacency(
    edge_parent: jax.Array,
    edge_child: jax.Array,
    edge_mask: jax.Array,
    n: int,
    dtype=jnp.float32,
) -> Adjacency:
    """Scatter padded edge lists into the dense forward band.

    Padded edge slots carry (0, 0) indices with a 0 value, so the scatter-add
    is a no-op for them.
    """
    b = edge_parent.shape[0]
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=edge_parent.dtype)[:, None], edge_parent.shape
    )
    vals = edge_mask.astype(dtype)
    forward = jnp.zeros((b, n, n), dtype=dtype).at[
        batch_idx, edge_parent, edge_child
    ].add(vals, mode="drop")

    deg_out = jnp.sum(forward, axis=2)  # children per node
    deg_in = jnp.sum(forward, axis=1)   # parents per node (≤1 in a tree)
    incident = (deg_out + deg_in) > 0
    denom = (deg_out + deg_in + incident.astype(dtype) + 1.0)[:, :, None]
    pool_mask = ~incident
    return Adjacency(forward=forward, incident=incident, denom=denom,
                     pool_mask=pool_mask)
