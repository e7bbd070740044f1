"""Device-mesh construction and sharding rules.

The reference is strictly single-device (SURVEY.md §2b); every capability
here is new, TPU-native surface:

* ``data`` axis — batch (data parallelism) over ICI,
* ``model`` axis — tensor/graph parallelism: vocabulary-sharded word
  embeddings, hidden-sharded deprel bilinear weights, and edge-sharded
  aggregation (the GNN analog of sequence parallelism: graph partitioning
  with boundary exchange, SURVEY.md §5).

Shardings are expressed as ``NamedSharding`` + PartitionSpec and handed to
``jax.jit`` — XLA GSPMD inserts the collectives (psum/all-gather) over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data × model) mesh.  ``data=None`` uses all remaining
    devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Shard every batch array along its leading (batch) axis on ``data``.

    Edge arrays could alternatively shard their edge axis on ``model`` for
    pure graph partitioning; the replicated-batch variant lives in
    ``edge_partition.py``.
    """
    from gcn_tpu.parallel.halo import is_plan_key, plan_spec

    spec = {}
    for k, v in batch.items():
        ndim = np.ndim(v)
        if is_plan_key(k):
            # halo plan arrays: device dim on `model`, batch dim on `data`
            spec[k] = NamedSharding(mesh, plan_spec(k, ndim))
        else:
            spec[k] = NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
    return spec


def param_shardings(mesh: Mesh, params: dict,
                    replicate_deprel: bool = False) -> dict:
    """Model-parallel placement for the large tables; everything else
    replicated.  ``replicate_deprel=True`` (set by the train step under
    ``graph_partition=halo``) keeps the deprel bilinear weight
    replicated: the sequence-parallel grouped transform needs the
    composed per-relation matrices whole on every device, and gathering
    an H-sharded weight there costs one [R,T,H] all-gather per band per
    layer per pass — a fixed few-MB replication beats that.

    * word embedding [V, D] → vocab-sharded on ``model`` (the embedding-
      parallel analog of expert sharding; lookups become a gather + psum
      inserted by GSPMD),
    * full_deprel bilinear weights [D, T, H] → output-hidden sharded
      (tensor parallelism: each device computes a slice of H),
    * classifier / MLP kernels [in, out] → output sharded.
    """

    axis = mesh.shape["model"]

    def sharded(leaf, dim):
        """P with ``dim`` on 'model' — but replicate when the dimension
        does not divide the axis (e.g. a 42-class classifier head on a
        4-way mesh); GSPMD would reject the uneven split outright."""
        nd = np.ndim(leaf)
        spec = [None] * nd
        if np.shape(leaf)[dim] % axis == 0:
            spec[dim] = "model"
        return NamedSharding(mesh, P(*spec))

    def rule(path, leaf):
        keys = [getattr(k, "key", "") for k in path]
        joined = "/".join(str(k) for k in keys)
        nd = np.ndim(leaf)
        if "word_emb" in joined and nd == 2:
            return sharded(leaf, 0)
        if "gcn_deprel_w" in joined and nd == 3:
            if replicate_deprel:
                return NamedSharding(mesh, P(*([None] * nd)))
            return sharded(leaf, 2)
        if ("mlp" in joined or "classifier" in joined) and nd == 2:
            return sharded(leaf, 1)
        return NamedSharding(mesh, P(*([None] * nd)))

    return jax.tree_util.tree_map_with_path(rule, params)


def opt_shardings(mesh: Mesh, opt_state, params,
                  replicate_deprel: bool = False):
    """Place optimizer state WITH its parameters.

    Optax state trees embed parameter-shaped subtrees (Adagrad/Adam moment
    accumulators keyed by the same nested names).  Any state leaf whose
    trailing path components + shape match a parameter gets that
    parameter's sharding; scalars/counters replicate.  A vocab-sharded
    embedding therefore shards its accumulator too — replicating it would
    forfeit the memory saving.
    """
    p_shard = param_shardings(mesh, params,
                              replicate_deprel=replicate_deprel)
    by_path: dict[tuple, NamedSharding] = {}
    for (path, leaf), (_, shard) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(p_shard)[0],
    ):
        keys = tuple(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path)
        by_path[keys] = (np.shape(leaf), shard)

    def rule(path, leaf):
        keys = tuple(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path)
        nd = np.ndim(leaf)
        for plen in range(len(keys), 0, -1):
            hit = by_path.get(keys[-plen:])
            if hit and hit[0] == np.shape(leaf):
                return hit[1]
        return NamedSharding(mesh, P(*([None] * nd)))

    return jax.tree_util.tree_map_with_path(rule, opt_state)


def replicated(mesh: Mesh, tree):
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(*([None] * np.ndim(leaf)))),
        tree,
    )
