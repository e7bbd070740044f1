"""Cross-sentence packing (data.dataset.PackedBatcher): several sentences
per node row, per-slot heads, LSTM carry resets at segment boundaries.

The acceptance bar is exactness: a packed batch must reproduce the
per-sentence rows' logits example-for-example (same params), so packing is
purely a throughput knob (VERDICT r2 "next" #3) with no quality surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.config import cgcn_preset
from gcn_tpu.data.dataset import Batcher, PackedBatcher, RelationDataset
from gcn_tpu.data.vocab import Vocab
from gcn_tpu.models.gcn import GCNClassifier

SAMPLE = "dataset/tacred/train.json"


def _cfg(adj_type="full_deprel", rnn=True):
    cfg = cgcn_preset()
    m = cfg.model
    m.adj_type = adj_type
    m.rnn = rnn
    m.rnn_hidden = 16
    m.rnn_impl = "scan"
    m.hidden_dim = 16
    m.deprel_emb_dim = 8
    m.emb_dim = 16
    m.pos_dim = 4
    m.ner_dim = 4
    m.vocab_size = 2
    m.input_dropout = 0.0
    m.gcn_dropout = 0.0
    m.rnn_dropout = 0.0
    cfg.train.word_dropout = 0.0
    return cfg


def _dataset(cfg):
    vocab = Vocab(["<PAD>", "<UNK>"])
    return RelationDataset(SAMPLE, cfg, vocab)


def test_packed_batcher_accounting():
    """Every example appears exactly once; shapes are static; gold labels
    align with the flattened slot order; rows respect the budgets."""
    cfg = _cfg()
    ds = _dataset(cfg)
    pb = PackedBatcher(ds, rows_per_batch=4, pack_len=96, max_slots=6)
    seen = 0
    for batch in pb:
        assert batch["words"].shape == (4, pb.pack_len)
        assert batch["slot_mask"].shape == (4, 6, pb.pack_len)
        assert batch["labels"].shape == (4 * 6,)
        em = batch["example_mask"].reshape(4, 6)
        sm = batch["slot_mask"]
        # real slots have tokens; empty slots have none
        assert (sm.any(axis=2) == em).all()
        # segments don't overlap within a row
        assert (sm.sum(axis=1) <= 1).all()
        seen += int(em.sum())
    assert seen == len(ds)
    assert len(pb.gold()) == len(ds)
    # packing actually packs (sample sentences are far shorter than 96)
    assert len(pb.rows) < len(ds)


@pytest.mark.parametrize("adj_type", ["regular", "full_deprel"])
def test_packed_forward_matches_per_sentence(adj_type):
    """Packed logits == per-sentence logits, example for example, with
    shared params (incl. the BiLSTM: carry resets make the packed row
    bit-equivalent to separate rows)."""
    cfg = _cfg(adj_type=adj_type)
    ds = _dataset(cfg)

    ref_batcher = Batcher(ds, batch_size=len(ds), evaluation=True)
    ref_batch = next(iter(ref_batcher))
    pb = PackedBatcher(ds, rows_per_batch=3, pack_len=96, max_slots=6,
                       evaluation=True)

    model = GCNClassifier(cfg.model)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        ref_batch, True,
    )
    fwd = jax.jit(lambda p, b: model.apply(p, b, True)[0])
    ref_logits = np.asarray(fwd(params, ref_batch))  # [n_ex, C] gold order

    got = []
    for batch in pb:
        logits = np.asarray(fwd(params, batch))
        got.extend(logits[np.asarray(batch["example_mask"])].tolist())
    got = np.asarray(got)
    want = ref_logits[pb.order]  # packed slot order
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_lstm_segment_reset_bit_equivalence():
    """Op-level: a packed row through the seg_start-aware scan equals the
    same sentences run in separate rows."""
    from gcn_tpu.ops.lstm import bilstm

    rng = np.random.RandomState(0)
    h_dim, d = 8, 6
    lens = [5, 3, 4]
    t_pack = 16

    def p(shape):
        return jnp.asarray(rng.randn(*shape) * 0.3, jnp.float32)

    layer = {
        dr: {"w_ih": p((d, 4 * h_dim)), "w_hh": p((h_dim, 4 * h_dim)),
             "b_ih": p((4 * h_dim,)), "b_hh": p((4 * h_dim,))}
        for dr in ("fwd", "bwd")
    }
    xs = [rng.randn(li, d).astype(np.float32) for li in lens]

    # separate rows
    sep = np.zeros((len(lens), max(lens), d), np.float32)
    for i, x in enumerate(xs):
        sep[i, : lens[i]] = x
    out_sep = bilstm([layer], jnp.asarray(sep),
                     jnp.asarray(lens, jnp.int32))

    # one packed row
    packed = np.zeros((1, t_pack, d), np.float32)
    seg = np.zeros((1, t_pack), bool)
    off = 0
    for x, li in zip(xs, lens):
        packed[0, off : off + li] = x
        seg[0, off] = True
        off += li
    out_pack = bilstm([layer], jnp.asarray(packed),
                      jnp.asarray([off], jnp.int32),
                      seg_start=jnp.asarray(seg))

    off = 0
    for i, li in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(out_pack[0, off : off + li]),
            np.asarray(out_sep[i, :li]),
            atol=1e-6,
        )
        off += li


def test_packed_training_step_runs():
    """Trainer.update on packed batches: finite decreasing loss and a
    working eval path (predictions in gold order)."""
    from gcn_tpu.train.scorer import score
    from gcn_tpu.train.trainer import Trainer

    cfg = _cfg(adj_type="regular", rnn=False)
    cfg.train.lr = 0.3
    ds = _dataset(cfg)
    pb = PackedBatcher(ds, rows_per_batch=4, pack_len=96, max_slots=6)
    tr = Trainer(cfg)
    losses = []
    for _ in range(6):
        for batch in pb:
            losses.append(float(tr.update(batch)))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    eval_pb = PackedBatcher(ds, rows_per_batch=4, pack_len=96, max_slots=6,
                            evaluation=True)
    preds, _, _ = tr.evaluate(eval_pb)
    assert len(preds) == len(ds)
    id2label = {v: k for k, v in ds.label2id.items()}
    p, r, f1 = score(eval_pb.gold(), [id2label[x] for x in preds],
                     negative_label="no_relation")
    assert 0.0 <= f1 <= 1.0


def test_pallas_lstm_segment_reset_matches_scan():
    """The persistent-kernel keep-mask reset (interpret mode on CPU) must
    match the scan path's segment resets — forward AND gradients."""
    from gcn_tpu.ops.lstm import bilstm

    rng = np.random.RandomState(1)
    h_dim, d, b, t = 8, 6, 3, 12

    def p(shape):
        return jnp.asarray(rng.randn(*shape) * 0.3, jnp.float32)

    layer = {
        dr: {"w_ih": p((d, 4 * h_dim)), "w_hh": p((h_dim, 4 * h_dim)),
             "b_ih": p((4 * h_dim,)), "b_hh": p((4 * h_dim,))}
        for dr in ("fwd", "bwd")
    }
    x = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    lengths = jnp.asarray([12, 9, 5], jnp.int32)
    seg = np.zeros((b, t), bool)
    seg[0, [0, 4, 7]] = True
    seg[1, [0, 3]] = True
    seg[2, 0] = True
    seg = jnp.asarray(seg)

    def run(impl):
        def f(params):
            out = bilstm([params], x, lengths, impl=impl, seg_start=seg)
            return jnp.sum(out ** 2), out

        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(layer)
        return out, grads

    out_s, g_s = run("scan")
    out_p, g_p = run("pallas")  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               atol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4
        ),
        g_p, g_s,
    )
