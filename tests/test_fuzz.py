"""Randomized sweeps: dense-vs-fused equivalence and model robustness over
random shapes, modes and graph structures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.config import ModelConfig
from gcn_tpu.models.gcn import GCNClassifier
from gcn_tpu.ops.adjacency import build_adjacency
from gcn_tpu.ops.pallas.band_aggregate import (
    band_ref_math,
    fused_band_aggregate,
)
from gcn_tpu.ops.spmm import spmm_forward


@pytest.mark.parametrize("seed", range(6))
def test_band_aggregate_random_shapes(seed):
    rng = np.random.RandomState(seed)
    b = rng.randint(1, 5)
    n = rng.randint(2, 40)
    e = rng.randint(1, 2 * n)
    h = rng.randint(1, 48)
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    child = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < rng.rand()
    xs = [jnp.asarray(rng.randn(b, n, h), jnp.float32) for _ in range(3)]
    out = fused_band_aggregate(parent, child, mask, *xs)
    ref = band_ref_math(parent, child, mask, *xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               err_msg=f"seed {seed} b={b} n={n} e={e} h={h}")


@pytest.mark.parametrize("seed", range(4))
def test_spmm_random_vs_dense(seed):
    rng = np.random.RandomState(100 + seed)
    b, n = rng.randint(1, 4), rng.randint(2, 30)
    e, h = rng.randint(1, 3 * n), rng.randint(1, 32)
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    child = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < 0.6
    weights = rng.rand(b, e).astype(np.float32)
    x = jnp.asarray(rng.randn(b, n, h), jnp.float32)
    adj_w = np.zeros((b, n, n), np.float32)
    for bi in range(b):
        for ei in range(e):
            if mask[bi, ei]:
                adj_w[bi, parent[bi, ei], child[bi, ei]] += weights[bi, ei]
    dense = jnp.matmul(jnp.asarray(adj_w), x)
    sparse = spmm_forward(x, parent, child, mask, edge_weights=weights)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_model_random_config_forward_backward(seed):
    """Random architecture + random forest: forward finite, grads finite."""
    rng = np.random.RandomState(200 + seed)
    adj_type = ["regular", "diagonal_deprel", "full_deprel", "attention"][
        seed % 4
    ]
    cfg = ModelConfig(
        vocab_size=50,
        emb_dim=int(rng.randint(8, 32)),
        pos_dim=int(rng.randint(0, 8)),
        ner_dim=int(rng.randint(0, 8)),
        hidden_dim=int(rng.randint(8, 32)),
        num_layers=int(rng.randint(1, 4)),
        rnn=bool(rng.rand() < 0.5),
        rnn_hidden=int(rng.randint(4, 16)),
        adj_type=adj_type,
        deprel_emb_dim=int(rng.randint(2, 12)),
        pooling=["max", "avg", "sum"][rng.randint(3)],
        mlp_layers=int(rng.randint(1, 3)),
        deprel_max_depth=int(rng.randint(0, 3)),
        input_dropout=0.3,
        gcn_dropout=0.3,
        num_class=42,
    )
    b = int(rng.randint(1, 4))
    n = int(rng.randint(3, 24))
    batch = dict(
        words=rng.randint(2, 50, (b, n)).astype(np.int32),
        pos=rng.randint(2, 40, (b, n)).astype(np.int32),
        ner=rng.randint(2, 10, (b, n)).astype(np.int32),
        deprel=rng.randint(2, 41, (b, n)).astype(np.int32),
        subj_mask=np.zeros((b, n), bool),
        obj_mask=np.zeros((b, n), bool),
        pad_mask=np.zeros((b, n), bool),
        lengths=np.full(b, n, np.int32),
        labels=rng.randint(0, 42, b).astype(np.int32),
        example_mask=np.ones(b, bool),
        edge_parent=np.zeros((b, n), np.int32),
        edge_child=np.zeros((b, n), np.int32),
        edge_deprel=np.zeros((b, n), np.int32),
        edge_mask=np.zeros((b, n), bool),
    )
    batch["subj_mask"][:, 0] = True
    batch["obj_mask"][:, -1] = True
    for i in range(b):
        for t in range(1, n):
            if rng.rand() < 0.8:
                batch["edge_parent"][i, t - 1] = rng.randint(t)
                batch["edge_child"][i, t - 1] = t
                batch["edge_deprel"][i, t - 1] = rng.randint(2, 41)
                batch["edge_mask"][i, t - 1] = True
    model = GCNClassifier(cfg)
    params = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(1)},
        batch, True,
    )
    logits, pooled = model.apply(params, batch, True)
    assert np.isfinite(np.asarray(logits)).all(), (adj_type, cfg)

    def loss(p, key):
        lg, _ = model.apply(p, batch, False, rngs={"dropout": key})
        return (lg ** 2).mean()

    g = jax.grad(loss)(params, jax.random.key(3))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat), adj_type
