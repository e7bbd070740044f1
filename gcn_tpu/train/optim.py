"""Optimizers (optax) with reference-exact update rules.

Reproduces ``utils/torch_utils.py:10-106``:

* ``adagrad`` is the reference's ``MyAdagrad`` — TF-style initial
  accumulator 0.1, ``g / (sqrt(Σg²) + 1e-10)``, optional per-step lr decay
  ``lr / (1 + (step-1)·lr_decay)`` (``utils/torch_utils.py:68,86-88``),
* ``adam``/``adamax`` IGNORE the passed lr and use torch defaults
  (1e-3 / 2e-3) — faithfully mirroring ``get_optimizer``
  (``utils/torch_utils.py:99-102``),
* ``sgd``/``adadelta`` use the passed lr.

The word-embedding fine-tuning policy (``topn``) is a gradient transform:
rows ≥ topn are zeroed before clipping, exactly like the reference's
backward hook (``utils/torch_utils.py:124-130`` via ``model/gcn.py:85-86``);
``topn ≤ 0`` freezes the whole table (the reference drops it from the
optimizer).  All optimizers are wrapped in ``optax.inject_hyperparams`` so
the plateau LR decay (``train.py:340-343``) can mutate the learning rate
in-place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdagradState(NamedTuple):
    step: jax.Array
    accum: optax.Updates


def scale_by_myadagrad(
    init_accu_value: float = 0.1, lr_decay: float = 0.0, eps: float = 1e-10
) -> optax.GradientTransformation:
    """Exact ``MyAdagrad`` accumulator rule (sans the learning rate, which
    is applied by the surrounding chain)."""

    def init_fn(params):
        accum = jax.tree.map(
            lambda p: jnp.full_like(p, init_accu_value), params
        )
        return AdagradState(step=jnp.zeros([], jnp.int32), accum=accum)

    def update_fn(updates, state, params=None):
        del params
        step = state.step + 1
        accum = jax.tree.map(lambda a, g: a + g * g, state.accum, updates)
        # clr = lr / (1 + (step-1)*lr_decay); expressed as a multiplier here
        decay = 1.0 / (1.0 + (step.astype(jnp.float32) - 1.0) * lr_decay)
        out = jax.tree.map(
            lambda g, a: decay * g / (jnp.sqrt(a) + eps), updates, accum
        )
        return out, AdagradState(step=step, accum=accum)

    return optax.GradientTransformation(init_fn, update_fn)


def partial_embedding_freeze(
    topn: int, word_emb_path: str = "word_emb"
) -> optax.GradientTransformation:
    """Zero word-embedding gradient rows ≥ ``topn`` (all rows if topn ≤ 0).

    Runs BEFORE gradient clipping, matching the reference where the backward
    hook fires during autograd so ``clip_grad_norm_`` sees masked gradients.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def mask(path, g):
            if any(
                getattr(k, "key", None) == word_emb_path for k in path
            ):
                if topn <= 0:
                    return jnp.zeros_like(g)
                if topn >= g.shape[0]:  # finetune everything
                    return g
                row = jnp.arange(g.shape[0])[:, None]
                return jnp.where(row < topn, g, 0.0)
            return g

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _core(name: str, learning_rate: float, lr_decay: float):
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name in ("adagrad", "myadagrad"):
        return optax.chain(
            scale_by_myadagrad(0.1, lr_decay),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "adam":
        # torch default lr (reference utils/torch_utils.py:100 passes none)
        return optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adamax":
        return optax.adamax(2e-3, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adadelta":
        return optax.adadelta(learning_rate, rho=0.9, eps=1e-6)
    raise ValueError(f"Unsupported optimizer: {name}")


def build_optimizer(
    name: str,
    learning_rate: float,
    max_grad_norm: float = 5.0,
    topn: int = int(1e10),
    lr_decay: float = 0.0,
    external_clip: bool = False,
) -> optax.GradientTransformation:
    """Freeze-mask → global-norm clip → optimizer, with ``learning_rate``
    exposed as a mutable hyperparameter (see ``set_learning_rate``).

    ``external_clip=True`` swaps the clip stage for ``optax.identity()``
    (same ``EmptyState``, so the optimizer-state pytree — and therefore
    checkpoints — are structurally identical): the caller applies the
    global-norm clip itself.  Used by the row-sparse embedding-gradient
    path, whose clip norm must include the row gradients that never enter
    this chain."""

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.chain(
            partial_embedding_freeze(topn),
            optax.identity() if external_clip
            else optax.clip_by_global_norm(max_grad_norm),
            _core(name, learning_rate, lr_decay),
        )

    return make(learning_rate)


def set_learning_rate(opt_state, new_lr: float):
    """Plateau decay hook (reference ``train.py:340-343`` +
    ``utils/torch_utils.py:108-110``)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        new_lr, dtype=jnp.float32
    )
    return opt_state
