"""Edge-attention aggregation mode (new capability beyond the reference —
its --deprel_attn flag was dead code)."""

import jax
import numpy as np
import pytest

from gcn_tpu.config import ModelConfig
from gcn_tpu.models.gcn import GCNClassifier


def make_batch(rng, b=4, n=12, vocab=60):
    batch = dict(
        words=rng.randint(2, vocab, (b, n)).astype(np.int32),
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
    batch["obj_mask"][:, 1] = True
    for i in range(b):
        for t in range(1, n):
            batch["edge_parent"][i, t - 1] = rng.randint(t)
            batch["edge_child"][i, t - 1] = t
            batch["edge_deprel"][i, t - 1] = rng.randint(2, 41)
            batch["edge_mask"][i, t - 1] = True
    return batch


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    cfg = ModelConfig(
        vocab_size=60, emb_dim=24, pos_dim=6, ner_dim=6, hidden_dim=16,
        rnn=False, adj_type="attention", num_class=42,
        input_dropout=0.0, gcn_dropout=0.0,
    )
    batch = make_batch(rng)
    model = GCNClassifier(cfg)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, True,
    )
    return cfg, model, params, batch, rng


def test_forward_finite(setup):
    cfg, model, params, batch, _ = setup
    logits, pooled = model.apply(params, batch, True)
    assert logits.shape == (4, 42)
    assert np.isfinite(np.asarray(logits)).all()


def test_gradients_flow_to_attention_params(setup):
    cfg, model, params, batch, _ = setup

    def loss(p):
        logits, _ = model.apply(p, batch, True)
        return (logits ** 2).sum()

    grads = jax.grad(loss)(params)
    for name in ("attn_q0", "attn_k0", "attn_q1", "attn_k1"):
        g = np.asarray(grads["params"][name])
        assert np.abs(g).sum() > 0, name


def test_edge_order_invariance(setup):
    """Permuting the edge list must not change the output."""
    cfg, model, params, batch, rng = setup
    logits1, _ = model.apply(params, batch, True)
    perm = rng.permutation(batch["edge_parent"].shape[1])
    batch2 = dict(batch)
    for key in ("edge_parent", "edge_child", "edge_deprel", "edge_mask"):
        batch2[key] = batch[key][:, perm]
    logits2, _ = model.apply(params, batch2, True)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=1e-5)


def test_trains_on_synthetic(setup):
    import optax

    cfg, model, params, batch, _ = setup
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits, _ = model.apply(p, batch, True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["labels"]
            ).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    first = None
    for _ in range(30):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))


def test_dense_impl_matches_edge_impl(setup):
    """attention_impl=dense (one [B,N,N] score matmul + masked softmax +
    dense aggregation — the measured winner at sentence scale) must be
    numerically the edge path (SDDMM + edge-softmax + weighted SpMM):
    same scores, same per-destination normalization, same bands."""
    import dataclasses

    cfg, model, params, batch, _ = setup
    outs = {}
    for impl in ("dense", "edge"):
        cfg_i = dataclasses.replace(cfg, attention_impl=impl)
        model_i = GCNClassifier(cfg_i)
        logits, pooled = model_i.apply(params, batch, True)
        outs[impl] = (np.asarray(logits), np.asarray(pooled))
    np.testing.assert_allclose(outs["dense"][0], outs["edge"][0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(outs["dense"][1], outs["edge"][1],
                               atol=2e-4, rtol=2e-4)


def test_dense_impl_grads_match_edge_impl(setup):
    import dataclasses

    cfg, model, params, batch, _ = setup
    grads = {}
    for impl in ("dense", "edge"):
        cfg_i = dataclasses.replace(cfg, attention_impl=impl)
        model_i = GCNClassifier(cfg_i)

        def loss(p):
            logits, _ = model_i.apply(p, batch, True)
            return (logits ** 2).sum()

        grads[impl] = jax.grad(loss)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        ),
        grads["dense"], grads["edge"],
    )


def test_dense_impl_matches_edge_impl_on_multigraph(setup):
    """A duplicated (parent, child) edge must contribute twice to the
    softmax denominator AND the aggregate in BOTH backends (the dense
    path weights exp(s) by the adjacency's multiplicity counts; a bool
    mask would silently collapse duplicates)."""
    import dataclasses

    cfg, model, params, batch, _ = setup
    dup = dict(batch)
    for key in ("edge_parent", "edge_child", "edge_deprel", "edge_mask"):
        # append a copy of the first 3 edges of every example
        dup[key] = np.concatenate([batch[key], batch[key][:, :3]], axis=1)
    outs = {}
    for impl in ("dense", "edge"):
        cfg_i = dataclasses.replace(cfg, attention_impl=impl)
        model_i = GCNClassifier(cfg_i)
        logits, _ = model_i.apply(params, dup, True)
        outs[impl] = np.asarray(logits)
    np.testing.assert_allclose(outs["dense"], outs["edge"],
                               atol=2e-4, rtol=2e-4)
    # and the duplicates actually changed the result vs the simple graph
    base, _ = GCNClassifier(dataclasses.replace(
        cfg, attention_impl="dense")).apply(params, batch, True)
    assert np.abs(outs["dense"] - np.asarray(base)).max() > 1e-6


def test_invalid_attention_impl_raises(setup):
    import dataclasses

    cfg, model, params, batch, _ = setup
    bad = GCNClassifier(dataclasses.replace(cfg, attention_impl="Dense"))
    with pytest.raises(ValueError, match="attention_impl"):
        bad.apply(params, batch, True)
