"""Single-buffer batch transfer (data.packing): exact round-trip and
bit-identical trainer behavior packed vs plain-dict feed."""

import jax
import numpy as np

from gcn_tpu.config import cgcn_preset
from gcn_tpu.data.packing import pack_batch, packable, unpack_batch
from gcn_tpu.train.trainer import Trainer, _dummy_batch


def tiny_cfg(dataset="tacred"):
    cfg = cgcn_preset()
    cfg.model.dataset = dataset
    cfg.model.vocab_size = 64
    cfg.model.emb_dim = 16
    cfg.model.pos_dim = 4
    cfg.model.ner_dim = 4
    cfg.model.rnn_hidden = 8
    cfg.model.hidden_dim = 8
    cfg.model.deprel_emb_dim = 4
    return cfg


def test_pack_roundtrip_exact():
    for dataset in ("tacred", "semeval"):
        cfg = tiny_cfg(dataset)
        batch = _dummy_batch(cfg)
        assert packable(batch)
        packed = pack_batch(batch)
        assert packed.dtype == np.int32 and packed.ndim == 2
        out = jax.jit(
            lambda p: unpack_batch(p, dataset == "tacred")
        )(packed)
        assert set(out) == set(batch), (set(out), set(batch))
        for k in batch:
            a, b = np.asarray(out[k]), np.asarray(batch[k])
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_bert_batches_not_packable():
    cfg = tiny_cfg()
    cfg.model.use_bert_embeddings = True
    batch = _dummy_batch(cfg, use_bert=True)
    assert not packable(batch)


def test_trainer_packed_matches_dict_feed():
    """Packed transfer is a pure transport change: loss, updated params
    and eval probs must be BIT-identical to the plain dict feed."""
    cfg = tiny_cfg()
    batch = _dummy_batch(cfg)

    cfg_plain = tiny_cfg()
    cfg_plain.train.pack_transfers = False
    tr_packed = Trainer(cfg, rng_seed=5, init_batch=batch)
    tr_plain = Trainer(cfg_plain, rng_seed=5, init_batch=batch)
    assert tr_packed._pack and not tr_plain._pack

    for _ in range(3):
        lp = tr_packed.update(batch)
        ld = tr_plain.update(batch)
    assert float(lp) == float(ld)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        tr_packed.params, tr_plain.params,
    )

    pp, lossp = tr_packed._eval_forward(batch)
    pd, lossd = tr_plain._eval_forward(batch)
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(pd))
    assert float(lossp) == float(lossd)


def test_update_chunk_matches_sequential():
    """k steps scanned in one dispatch must produce bit-identical params
    and losses to k per-batch updates (same fold_in streams)."""
    cfg = tiny_cfg()
    b1 = _dummy_batch(cfg)
    b2 = {k: (v + 1 if k == "words" else v) for k, v in b1.items()}
    b3 = {k: (v + 2 if k == "words" else v) for k, v in b1.items()}
    batches = [b1, b2, b3, b1]

    tr_seq = Trainer(cfg, rng_seed=9, init_batch=b1)
    seq_losses = [float(tr_seq.update(b)) for b in batches]

    tr_chunk = Trainer(cfg, rng_seed=9, init_batch=b1)
    chunk_losses = [float(x) for x in tr_chunk.update_chunk(batches)]

    assert seq_losses == chunk_losses
    assert tr_chunk.global_step == tr_seq.global_step == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        tr_seq.params, tr_chunk.params,
    )

    # mixed shapes fall back to per-batch updates transparently
    wide = _dummy_batch(cfg)
    wide = {k: (np.concatenate([v, v], axis=1)
                if v.ndim == 2 else v) for k, v in wide.items()}
    out = tr_chunk.update_chunk([b1, wide])
    assert len(out) == 2 and tr_chunk.global_step == 6


def test_evaluate_chunked_matches_sequential():
    """Chunked evaluation (steps_per_dispatch > 1) must return the exact
    preds/probs/avg-loss of the per-batch path, across shape changes."""
    cfg = tiny_cfg()
    b1 = _dummy_batch(cfg)
    b2 = {k: (v + 1 if k == "words" else v) for k, v in b1.items()}
    wide = {k: (np.concatenate([v, v], axis=1) if v.ndim == 2 else v)
            for k, v in b1.items()}
    batches = [b1, b2, b1, wide, b2, b1, b2]

    tr = Trainer(cfg, rng_seed=3, init_batch=b1)
    seq = tr.evaluate(list(batches))

    cfg2 = tiny_cfg()
    cfg2.train.steps_per_dispatch = 3
    tr2 = Trainer(cfg2, rng_seed=3, init_batch=b1)
    chunked = tr2.evaluate(list(batches))

    assert seq[0] == chunked[0]
    np.testing.assert_array_equal(np.asarray(seq[1]), np.asarray(chunked[1]))
    assert seq[2] == chunked[2]


def test_pack_roundtrip_randomized():
    """Random shapes/contents round-trip exactly (both dataset flavors)."""
    rng = np.random.RandomState(0)
    from gcn_tpu.data.packing import field_order

    for trial in range(20):
        dataset = "tacred" if trial % 2 == 0 else "semeval"
        b = int(rng.randint(1, 9))
        n = int(rng.randint(2, 50))
        batch = {}
        for f in field_order(dataset == "tacred"):
            if f in ("edge_mask", "subj_mask", "obj_mask", "pad_mask"):
                batch[f] = rng.rand(b, n) < 0.5
            else:
                batch[f] = rng.randint(0, 2**20, (b, n)).astype(np.int32)
        batch["lengths"] = rng.randint(1, n + 1, b).astype(np.int32)
        batch["labels"] = rng.randint(0, 42, b).astype(np.int32)
        batch["example_mask"] = rng.rand(b) < 0.8
        assert packable(batch)
        out = unpack_batch(pack_batch(batch), dataset == "tacred")
        for k in batch:
            a, c = np.asarray(out[k]), np.asarray(batch[k])
            assert a.dtype == c.dtype, (k, a.dtype, c.dtype)
            np.testing.assert_array_equal(a, c, err_msg=f"{dataset}/{k}")


def test_compact_roundtrip_randomized():
    """The uint8 compact wire format round-trips exactly and is ~2.75x
    smaller than the int32 layout."""
    rng = np.random.RandomState(1)
    from gcn_tpu.data.packing import (
        field_order,
        pack_batch,
        pack_batch_compact,
        unpack_batch,
    )

    for trial in range(10):
        dataset = "tacred" if trial % 2 == 0 else "semeval"
        b = int(rng.randint(1, 9))
        n = int(rng.randint(2, 50))
        batch = {}
        for f in field_order(dataset == "tacred"):
            if f in ("edge_mask", "subj_mask", "obj_mask", "pad_mask"):
                batch[f] = rng.rand(b, n) < 0.5
            elif f == "words":
                batch[f] = rng.randint(0, 2**20, (b, n)).astype(np.int32)
            elif f in ("edge_parent", "edge_child"):
                batch[f] = rng.randint(0, n, (b, n)).astype(np.int32)
            else:
                batch[f] = rng.randint(0, 256, (b, n)).astype(np.int32)
        batch["lengths"] = rng.randint(1, n + 1, b).astype(np.int32)
        batch["labels"] = rng.randint(0, 42, b).astype(np.int32)
        batch["example_mask"] = rng.rand(b) < 0.8
        buf = pack_batch_compact(batch)
        assert buf.dtype == np.uint8
        assert buf.nbytes < pack_batch(batch).nbytes / 2.5
        # unpack_batch routes on dtype
        out = unpack_batch(buf, dataset == "tacred")
        for k in batch:
            a, c = np.asarray(out[k]), np.asarray(batch[k])
            assert a.dtype == c.dtype, (k, a.dtype, c.dtype)
            np.testing.assert_array_equal(a, c, err_msg=f"{dataset}/{k}")


def test_sentence_packed_roundtrip():
    """The sentence-packed (PackedBatcher) wire format round-trips
    exactly, host-side and under jit."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.packing import (
        pack_sentence_batch,
        sentence_packable,
        sp_width,
        unpack_sentence_batch,
    )

    rng = np.random.RandomState(2)
    for has_ner, n, s in ((True, 23, 4), (False, 96, 6), (True, 8, 1)):
        b = 5
        batch = {
            "words": rng.randint(0, 90000, (b, n)).astype(np.int32),
            "pos": rng.randint(0, 48, (b, n)).astype(np.int32),
            "deprel": rng.randint(0, 85, (b, n)).astype(np.int32),
            "edge_deprel": rng.randint(0, 85, (b, n)).astype(np.int32),
            "edge_parent": rng.randint(0, n, (b, n)).astype(np.int32),
            "edge_child": rng.randint(0, n, (b, n)).astype(np.int32),
            "edge_mask": rng.rand(b, n) < 0.5,
            "pad_mask": rng.rand(b, n) < 0.5,
            "seg_start": rng.rand(b, n) < 0.3,
            "slot_mask": rng.rand(b, s, n) < 0.5,
            "subj_mask": rng.rand(b, s, n) < 0.2,
            "obj_mask": rng.rand(b, s, n) < 0.2,
            "lengths": rng.randint(1, n + 1, b).astype(np.int32),
            "labels": rng.randint(0, 42, b * s).astype(np.int32),
            "example_mask": rng.rand(b * s) < 0.8,
        }
        if has_ner:
            batch["ner"] = rng.randint(0, 15, (b, n)).astype(np.int32)
        assert sentence_packable(batch)
        buf = pack_sentence_batch(batch)
        assert buf.shape == (b, sp_width(n, s, has_ner))
        for out in (
            unpack_sentence_batch(buf, n, s, has_ner),
            jax.jit(lambda p: unpack_sentence_batch(p, n, s, has_ner))(
                jnp.asarray(buf)
            ),
        ):
            assert set(out) == set(batch)
            for k in batch:
                np.testing.assert_array_equal(
                    np.asarray(out[k]),
                    np.asarray(batch[k]).astype(np.asarray(out[k]).dtype),
                    err_msg=k,
                )
        # halo plan keys exclude the format
        assert not sentence_packable({**batch, "hplan_send": np.zeros(3)})
