"""Row-sparse embedding gradients: update only the touched vocab rows.

The word-embedding table is by far the largest parameter (TACRED GloVe
vocab ~53k × 300 = 64 MB fp32), and a dense training step pays ~7 HBM
passes over it every step: the backward scatter-add materializes a dense
[V, E] gradient, the global-norm clip reads it, and Adagrad reads/writes
the accumulator and parameter — measured **+0.36 ms/step** going from an
8k to the real 53k vocab on the v5e, for a batch that touches ≤ 4,800
rows.  The reference has the same insight in torch form: ``MyAdagrad``
implements a sparse-gradient branch (reference ``utils/torch_utils.py:
60-80``) fed by sparse embedding lookups (``model/dropouts.py:36``).

TPU-native version (all static shapes):

1. the trainer gathers the batch's rows OUTSIDE the differentiated
   closure and injects them into the model (``batch["word_vecs"]``), so
   ``jax.grad`` returns a [B, N, E] row cotangent and the table's dense
   cotangent is a dead constant zero (eliminated by XLA DCE together
   with the whole dense update chain, whose spliced-over outputs are
   unused);
2. duplicate token ids are coalesced by a sort + run segment-sum (torch
   sparse semantics: duplicates sum before the update rule applies —
   which is exactly what the dense scatter-add computes, so the sparse
   and dense paths are numerically equivalent);
3. the global-norm clip uses the exact ``optax.clip_by_global_norm``
   formula over (all dense grads) ∪ (coalesced rows);
4. the update rule runs on ≤ B·N rows and two scatters write them back
   (parameter + Adagrad accumulator) — O(B·N·E) traffic instead of
   O(V·E).

Supported for the row-local optimizers where untouched-row state is a
no-op (sgd, adagrad/MyAdagrad) — adam-family decay mutates every row
every step, so those stay dense.  The optimizer-state pytree is
structurally identical to the dense mode (``build_optimizer(...,
external_clip=True)`` swaps the clip stage for ``optax.identity()``,
both ``EmptyState``), so checkpoints are interchangeable across modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gcn_tpu.train.optim import AdagradState

_EPS = 1e-10  # MyAdagrad denominator eps (reference utils/torch_utils.py:86)


def supported(optim_name: str) -> bool:
    """Optimizers whose dense update is a no-op on zero-gradient rows."""
    return optim_name in ("sgd", "adagrad", "myadagrad")


def coalesce(ids, rows):
    """Sum duplicate-id rows (torch sparse-grad semantics).

    Returns ``(sorted_ids, coalesced_rows)`` where ``coalesced_rows[i]``
    holds the full per-id sum at each run's FIRST position and zeros at
    duplicate positions — so a single ``table.at[sorted_ids].add(...)``
    applies each id's update exactly once.
    """
    ids = ids.reshape(-1)
    rows = rows.reshape(ids.shape[0], -1)
    order = jnp.argsort(ids)
    sids = ids[order]
    srows = rows[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
    )
    run = jnp.cumsum(first) - 1  # run index per position
    sums = jax.ops.segment_sum(srows, run, num_segments=sids.shape[0])
    coalesced = jnp.where(first[:, None], jnp.take(sums, run, axis=0), 0.0)
    return sids, coalesced


def _clip_fn(t, g_norm, max_norm):
    """Exact ``optax.clip_by_global_norm`` element rule."""
    trigger = g_norm < max_norm
    return jax.lax.select(
        trigger, t, (t / g_norm.astype(t.dtype)) * max_norm
    )


def _adagrad_state(opt_state) -> AdagradState:
    st = opt_state.inner_state[2][0]
    assert isinstance(st, AdagradState), st
    return st


def sparse_step(
    tx,
    params,
    opt_state,
    g_full,
    word_ids,
    g_rows,
    *,
    optim: str,
    topn: int,
    max_grad_norm: float,
    lr_decay: float = 0.0,
):
    """One optimizer step with a row-sparse word-embedding update.

    ``g_full`` is the gradient tree from the row-injected loss (its
    ``word_emb`` leaf is a dead zero); ``g_rows`` is the [B, N, E] row
    cotangent for ``word_ids``.  ``tx`` must be built with
    ``external_clip=True`` — the clip happens here so its norm includes
    the row gradients.  Returns ``(new_params, new_opt_state)``.
    """
    emb = params["params"]["word_emb"]

    # 1. partial-finetune freeze (reference keep_partial_grad semantics,
    #    BEFORE the clip so the norm sees masked gradients)
    if topn <= 0:
        g_rows = jnp.zeros_like(g_rows)
    elif topn < emb.shape[0]:
        g_rows = jnp.where(
            (word_ids < topn)[..., None], g_rows, 0.0
        )

    # 2. coalesce duplicates (== the dense scatter-add's per-row sums)
    sids, crows = coalesce(word_ids, g_rows)

    # 3. global-norm clip over dense grads + coalesced rows.  The zero
    #    word_emb leaf contributes 0 to optax.global_norm.
    g_norm = jnp.sqrt(
        optax.global_norm(g_full) ** 2
        + jnp.sum(jnp.square(crows.astype(jnp.float32)))
    )
    g_scaled = jax.tree.map(
        lambda t: _clip_fn(t, g_norm, max_grad_norm), g_full
    )
    crows = _clip_fn(crows, g_norm, max_grad_norm)

    # 4. dense chain on everything else (its word_emb output is spliced
    #    over below, so XLA dead-code-eliminates the dense table math)
    lr = opt_state.hyperparams["learning_rate"]
    if optim in ("adagrad", "myadagrad"):
        prev = _adagrad_state(opt_state)
        accum = prev.accum["params"]["word_emb"]
        step = prev.step + 1
    updates, new_state = tx.update(g_scaled, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    # 5. row update rule (exactly the dense rule on the touched rows;
    #    duplicate positions carry zeros so the scatters are no-ops there)
    if optim == "sgd":
        row_updates = -lr * crows
    else:
        acc_rows = jnp.take(accum, sids, axis=0) + jnp.square(crows)
        decay = 1.0 / (1.0 + (step.astype(jnp.float32) - 1.0) * lr_decay)
        row_updates = -lr * decay * crows / (jnp.sqrt(acc_rows) + _EPS)
        new_accum = accum.at[sids].add(jnp.square(crows))
        ada = _adagrad_state(new_state)
        ada_accum = dict(ada.accum)
        ada_accum["params"] = dict(ada.accum["params"])
        ada_accum["params"]["word_emb"] = new_accum
        inner = list(new_state.inner_state)
        core = list(inner[2])
        core[0] = ada._replace(accum=ada_accum)
        inner[2] = tuple(core)
        new_state = new_state._replace(inner_state=tuple(inner))

    new_params = dict(new_params)
    new_params["params"] = dict(new_params["params"])
    new_params["params"]["word_emb"] = emb.at[sids].add(
        row_updates.astype(emb.dtype)
    )
    return new_params, new_state
