"""Masked pooling over token axes.

Semantics match reference ``model/gcn.py:473-483`` (``pool``): the mask is
True for tokens to EXCLUDE.  ``max`` fills with −1e12 before the reduction;
``avg`` divides by the count of kept tokens; ``sum`` plain-sums the kept
tokens.

The only deliberate deviation: ``avg`` clamps the divisor at 1 so fully
masked rows (batch padding / empty pruned trees) yield 0 instead of NaN —
the reference would divide by zero there (it never pads the batch axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcn_tpu.constants import INFINITY_NUMBER


def pool(h: jax.Array, exclude_mask: jax.Array, kind: str = "max") -> jax.Array:
    """h: [B,N,H]; exclude_mask: [B,N] bool (True = drop). Returns [B,H]."""
    m = exclude_mask[:, :, None]
    if kind == "max":
        filled = jnp.where(m, jnp.asarray(-INFINITY_NUMBER, h.dtype), h)
        return jnp.max(filled, axis=1)
    elif kind == "avg":
        filled = jnp.where(m, jnp.zeros((), h.dtype), h)
        count = jnp.sum(~exclude_mask, axis=1, keepdims=True).astype(h.dtype)
        return jnp.sum(filled, axis=1) / jnp.maximum(count, 1.0)
    elif kind == "sum":
        filled = jnp.where(m, jnp.zeros((), h.dtype), h)
        return jnp.sum(filled, axis=1)
    raise ValueError(f"unknown pooling kind: {kind}")


def pool_slots(h: jax.Array, exclude_mask: jax.Array,
               kind: str = "max") -> jax.Array:
    """Per-slot pooling for cross-sentence-packed rows.

    h: [B,N,H]; exclude_mask: [B,S,N] bool (True = drop) — slot s of row b
    pools over its own token span.  Returns [B,S,H].  Same semantics as
    ``pool`` (−1e12 max fill, clamped avg divisor); the [B,S,N,H]
    broadcast never materializes — XLA fuses the select into the
    reduction.
    """
    m = exclude_mask[:, :, :, None]          # [B,S,N,1]
    hx = h[:, None, :, :]                    # [B,1,N,H]
    if kind == "max":
        filled = jnp.where(m, jnp.asarray(-INFINITY_NUMBER, h.dtype), hx)
        return jnp.max(filled, axis=2)
    elif kind == "avg":
        filled = jnp.where(m, jnp.zeros((), h.dtype), hx)
        count = jnp.sum(~exclude_mask, axis=2, keepdims=True).astype(h.dtype)
        return jnp.sum(filled, axis=2) / jnp.maximum(count, 1.0)
    elif kind == "sum":
        filled = jnp.where(m, jnp.zeros((), h.dtype), hx)
        return jnp.sum(filled, axis=2)
    raise ValueError(f"unknown pooling kind: {kind}")


def triple_pool(
    h: jax.Array,
    sent_exclude: jax.Array,
    subj_exclude: jax.Array,
    obj_exclude: jax.Array,
    kind: str = "max",
) -> jax.Array:
    """Sentence/subject/object pooling in one pass → concat [B, 3H]
    (reference ``model/gcn.py:114-121``)."""
    return jnp.concatenate(
        [
            pool(h, sent_exclude, kind),
            pool(h, subj_exclude, kind),
            pool(h, obj_exclude, kind),
        ],
        axis=1,
    )
