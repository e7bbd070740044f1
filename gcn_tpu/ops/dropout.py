"""Stochastic regularizers as pure RNG-keyed functions.

Covers every stochastic mechanism of the reference:

* standard inverted dropout (``nn.Dropout`` uses: input/gcn/rnn dropout),
* type-level embedding dropout (reference ``model/dropouts.py:23-39``),
* variational (per-sequence) dropout (``model/dropouts.py:7-20``; defined
  but unused in the reference — provided for flag-parity),
* edge dropout (``model/gcn.py:436-449``),
* deprel forgetting (``model/gcn.py:451-470``).

Exact RNG streams cannot match PyTorch; parity is defined in eval mode
(deterministic) per SURVEY.md §7 hard-part 5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout (torch ``nn.Dropout`` semantics)."""
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def variational_dropout(key, x, rate: float, deterministic: bool):
    """Shared mask across the sequence axis: mask [B,1,D]
    (reference ``model/dropouts.py:12-20``)."""
    if deterministic or rate <= 0.0:
        return x
    b, _, d = x.shape
    keep = jax.random.bernoulli(key, 1.0 - rate, (b, 1, d))
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def embedding_dropout_mask(
    key, token_ids: jax.Array, vocab_size: int, rate: float,
    deterministic: bool,
):
    """Per-(row, word-TYPE) keep mask gathered back to token positions.

    Matches reference ``model/dropouts.py:28-39``: all occurrences of the
    same vocabulary id within one batch row share a single Bernoulli draw.
    Returns a [B, L, 1] multiplier (already scaled by 1/(1-p)), or None when
    inactive.
    """
    if deterministic or rate <= 0.0:
        return None
    b = token_ids.shape[0]
    type_keep = jax.random.bernoulli(key, 1.0 - rate, (b, vocab_size))
    tok_keep = jnp.take_along_axis(type_keep, token_ids, axis=1)
    return tok_keep[:, :, None].astype(jnp.float32) / (1.0 - rate)


def drop_edges(key, adj_band: jax.Array, keep_prob: float,
               deterministic: bool):
    """Bernoulli-mask a 0/1 adjacency band (reference ``maybe_drop_edges``,
    ``model/gcn.py:436-449``)."""
    if deterministic or keep_prob >= 1.0:
        return adj_band
    keep = jax.random.bernoulli(key, keep_prob, adj_band.shape)
    return adj_band * keep.astype(adj_band.dtype)


def forget_deprels(key, deprel_embs: jax.Array, keep_prop: float,
                   deterministic: bool):
    """Replace a token's deprel embedding with the all-ones vector with
    probability 1−keep_prop (reference ``maybe_forget_deprels``,
    ``model/gcn.py:451-470``).  Ones (not zeros) so the edge itself survives.
    """
    if deterministic or keep_prop >= 1.0:
        return deprel_embs
    b, n, _ = deprel_embs.shape
    keep = jax.random.bernoulli(key, keep_prop, (b, n, 1))
    return jnp.where(keep, deprel_embs, jnp.ones((), deprel_embs.dtype))
