"""Factored full_deprel (per-relation composed matrices + grouped matmul)
must match the reference-parity einsum path exactly up to float
reassociation — forward, gradients, and under every stochastic mechanism
(deprel forgetting, edge dropout, deprel_max_depth).

The factored path replaces the reference's dominant per-token contraction
(reference ``model/gcn.py:400-415``) with ``h[m] @ S[ids[m]]`` where
``S = Σ_d table[·,d]·W[d]`` — see ``ops.gcn_layers.compose_relation_
transforms``.  Both paths share one RNG stream, so stochastic masks are
bit-identical and outputs must agree to fp32 reassociation tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.config import ModelConfig
from gcn_tpu.models.gcn import GCNClassifier
from gcn_tpu.ops.gcn_layers import (
    bilinear_traverse,
    compose_relation_transforms,
    grouped_bilinear,
)


def _batch(rng, b, n, n_deprel=41):
    batch = dict(
        words=rng.randint(2, 50, (b, n)).astype(np.int32),
        pos=rng.randint(2, 40, (b, n)).astype(np.int32),
        ner=rng.randint(2, 10, (b, n)).astype(np.int32),
        deprel=np.where(
            rng.rand(b, n) < 0.15, 0, rng.randint(2, n_deprel, (b, n))
        ).astype(np.int32),
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
            batch["edge_parent"][i, t - 1] = rng.randint(t)
            batch["edge_child"][i, t - 1] = t
            batch["edge_deprel"][i, t - 1] = rng.randint(2, n_deprel)
            batch["edge_mask"][i, t - 1] = True
    return batch


def test_grouped_bilinear_matches_einsum():
    """Op-level: grouped matmul == Σ_d e_d (h W_d) for e = table[ids]."""
    rng = np.random.RandomState(0)
    b, n, t, h_dim, d, r = 3, 17, 12, 9, 5, 20
    h = jnp.asarray(rng.randn(b, n, t), jnp.float32)
    table = jnp.asarray(rng.randn(r, d), jnp.float32)
    w = jnp.asarray(rng.randn(d, t, h_dim), jnp.float32)
    bias = jnp.asarray(rng.randn(d, h_dim), jnp.float32)
    ids = jnp.asarray(rng.randint(0, r, (b, n)), jnp.int32)

    e = jnp.take(table, ids, axis=0)
    ref = bilinear_traverse(h, e, w, bias)

    s, bs = compose_relation_transforms(table, w, bias)
    out = grouped_bilinear(h, ids, s, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _model_pair(**overrides):
    base = dict(
        vocab_size=50, emb_dim=16, pos_dim=6, ner_dim=6, hidden_dim=14,
        num_layers=2, rnn=False, adj_type="full_deprel", deprel_emb_dim=7,
        deprel_max_depth=5, input_dropout=0.0, gcn_dropout=0.0,
        num_class=42, use_pallas=False,
    )
    base.update(overrides)
    cfg_e = ModelConfig(**base, deprel_factored=False)
    cfg_f = ModelConfig(**base, deprel_factored=True)
    return GCNClassifier(cfg_e), GCNClassifier(cfg_f)


@pytest.mark.parametrize(
    "overrides, deterministic",
    [
        ({}, True),
        ({"deprel_directed": True}, True),
        ({"deprel_self_loop": False}, True),
        ({"deprel_max_depth": 1}, True),          # layer 1 goes all-ones
        ({"deprel_shared_w": True, "rnn": True, "rnn_hidden": 7}, True),
        ({"deprel_keep_prop": 0.6}, False),        # forgetting active
        ({"edge_keep_prob": 0.7}, False),          # edge dropout active
        ({"deprel_keep_prop": 0.6, "edge_keep_prob": 0.7,
          "deprel_max_depth": 1}, False),
    ],
)
def test_model_factored_matches_einsum(overrides, deterministic):
    rng = np.random.RandomState(7)
    batch = _batch(rng, b=3, n=19)
    model_e, model_f = _model_pair(**overrides)
    params = model_e.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, True,
    )
    rngs = None if deterministic else {"dropout": jax.random.key(42)}
    kw = {} if deterministic else {"rngs": rngs}
    le, pe = model_e.apply(params, batch, deterministic, **kw)
    lf, pf = model_f.apply(params, batch, deterministic, **kw)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pe),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match():
    """value_and_grad through both paths agrees (training equivalence)."""
    rng = np.random.RandomState(11)
    batch = _batch(rng, b=2, n=13)
    model_e, model_f = _model_pair(deprel_keep_prop=0.7)
    params = model_e.init(
        {"params": jax.random.key(2), "dropout": jax.random.key(3)},
        batch, True,
    )

    def loss(model):
        def f(p):
            lg, _ = model.apply(p, batch, False,
                                rngs={"dropout": jax.random.key(9)})
            return (lg ** 2).mean()
        return jax.value_and_grad(f)(params)

    le, ge = loss(model_e)
    lf, gf = loss(model_f)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-5)
    flat_e = jax.tree_util.tree_flatten_with_path(ge)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    for (pth, ae), (_, af) in zip(flat_e, flat_f):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ae), rtol=2e-4, atol=1e-5,
            err_msg=str(pth),
        )


def test_fused_pallas_components_factored():
    """use_pallas=True + factored: the grouped bilinear feeds the fused
    band aggregation and still matches the dense einsum path."""
    rng = np.random.RandomState(5)
    batch = _batch(rng, b=2, n=16)
    base = dict(
        vocab_size=50, emb_dim=16, pos_dim=0, ner_dim=0, hidden_dim=12,
        num_layers=2, rnn=False, adj_type="full_deprel", deprel_emb_dim=6,
        deprel_max_depth=5, input_dropout=0.0, gcn_dropout=0.0,
        num_class=42,
    )
    m_ref = GCNClassifier(ModelConfig(
        **base, use_pallas=False, deprel_factored=False))
    m_fused = GCNClassifier(ModelConfig(
        **base, use_pallas=True, deprel_factored=True))
    params = m_ref.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, True,
    )
    le, _ = m_ref.apply(params, batch, True)
    lf, _ = m_fused.apply(params, batch, True)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                               rtol=1e-4, atol=1e-4)
