"""Sharded training step: DP over ``data`` × TP/EP over ``model``.

Builds one jitted SPMD program for the full train step (forward, backward,
clip, optimizer update) with explicit input/output shardings; XLA GSPMD
lowers the cross-device math to ICI collectives.  This is the multi-chip
path the reference never had (single device only, SURVEY.md §2b).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from gcn_tpu.config import Config
from gcn_tpu.models.gcn import GCNClassifier
from gcn_tpu.parallel.mesh import (
    batch_shardings,
    opt_shardings,
    param_shardings,
)
from gcn_tpu.train.trainer import conv_l2_penalty


def make_loss_fn(model: GCNClassifier, cfg: Config,
                 mesh: Mesh | None = None) -> Callable:
    """``mesh`` activates shard-local grouping for the factored
    full_deprel path (``utils.shard_ctx``): tokens are sorted/grouped per
    data shard inside ``shard_map`` instead of via a cross-device sort.
    It also carries the graph-partition context when
    ``cfg.model.graph_partition`` requests the edge-partitioned / halo
    aggregation over the ``model`` axis."""
    from gcn_tpu.utils.shard_ctx import graph_partition, local_grouping

    def loss_fn(params, batch, key):
        with local_grouping(mesh), graph_partition(
                cfg.model.graph_partition, mesh):
            logits, pooled = model.apply(
                params, batch, False, rngs={"dropout": key}
            )
        logits = logits.astype(jnp.float32)  # fp32 CE always (see Trainer)
        em = batch["example_mask"].astype(jnp.float32)
        denom = jnp.maximum(em.sum(), 1.0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        )
        loss = (ce * em).sum() / denom
        if cfg.train.conv_l2 > 0:
            loss = loss + cfg.train.conv_l2 * conv_l2_penalty(
                params, cfg.model.adj_type
            )
        if cfg.train.pooling_l2 > 0:
            loss = loss + cfg.train.pooling_l2 * (
                (jnp.square(pooled).sum(1) * em).sum() / denom
            )
        return loss

    return loss_fn


def make_sharded_train_step(
    model: GCNClassifier,
    tx: optax.GradientTransformation,
    cfg: Config,
    mesh: Mesh,
    params: Any,
    opt_state: Any,
    example_batch: dict,
):
    """Returns (train_step, placed_params, placed_opt_state, batch_spec).

    ``train_step(params, opt_state, batch, key) -> (params, opt_state, loss)``
    is donated+jitted with explicit shardings: batch over ``data``, large
    tables over ``model`` (see ``mesh.param_shardings``).
    """
    loss_fn = make_loss_fn(model, cfg, mesh=mesh)
    rep_dep = cfg.model.graph_partition == "halo"
    p_shard = param_shardings(mesh, params, replicate_deprel=rep_dep)
    o_shard = opt_shardings(mesh, opt_state, params,
                            replicate_deprel=rep_dep)
    b_shard = batch_shardings(mesh, example_batch)

    placed_params = jax.device_put(params, p_shard)
    placed_opt = jax.device_put(opt_state, o_shard)

    # ONE donated jitted SPMD program for the whole step (grad + clip +
    # optimizer update), matching the single-device fused path: one
    # dispatch per step and the gradient tree never round-trips HBM.
    # (An earlier revision split grad/apply to work around a remote-
    # compile-service slowdown the fused single-device path has since
    # retired; equality vs the split path is covered by
    # tests/test_parallel.py.)
    #
    # Halo mode compiles with async all-to-all: XLA:TPU lowers the
    # boundary exchange SYNCHRONOUSLY by default, serializing it with the
    # local-edge aggregation; with the flag it becomes a start/done pair
    # and the scheduler places the local scatter-add INSIDE the window —
    # verified on the scheduled HLO for a v5e-8 topology by
    # tools/aot_topology.py (docs/design.md §6b).
    jit_kwargs = {}
    if (cfg.model.graph_partition == "halo"
            and jax.default_backend() == "tpu"):
        jit_kwargs["compiler_options"] = {
            "xla_tpu_enable_async_all_to_all": "true"}

    @partial(jax.jit, donate_argnums=(0, 1), **jit_kwargs)
    def fused_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(params, opt_state, batch, key):
        batch = jax.device_put(batch, b_shard)
        return fused_step(params, opt_state, batch, key)

    return run, placed_params, placed_opt, b_shard
