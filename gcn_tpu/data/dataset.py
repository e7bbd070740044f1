"""Datasets and static-shape batching for relation extraction.

Replaces the reference loaders (``data/loader.py``, ``data/semeval_loader.py``)
with a TPU-friendly pipeline:

* JSON → id arrays once at load (entity anonymization, position sequences —
  same semantics as reference ``data/loader.py:44-72``),
* dependency trees pruned **once** here (not per forward pass) into edge
  lists (``gcn_tpu.graph.prune``),
* batches padded to a small set of static length buckets so XLA compiles a
  handful of programs instead of one per sentence length,
* ragged trailing batches padded on the batch axis with an ``example_mask``
  (the loss and scorer ignore padded rows), keeping every compiled shape
  identical.

The reference sorts each batch by length for cuDNN packed sequences
(``data/loader.py:92-94``) and unsorts predictions afterwards; the TPU LSTM
is a masked ``lax.scan`` and needs no sorting, so examples stay in gold
order and ``orig_idx`` is the identity.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from gcn_tpu import constants as tacred_constants
from gcn_tpu import constants_semeval as semeval_constants
from gcn_tpu.config import Config
from gcn_tpu.data.vocab import Vocab, map_to_ids
from gcn_tpu.graph.prune import PrunedGraph, prune_graph


def get_positions(start_idx: int, end_idx: int, length: int) -> list[int]:
    """Entity-relative position sequence (reference ``data/loader.py:162-165``):
    negative before the span, 0 inside, positive after."""
    return (
        list(range(-start_idx, 0))
        + [0] * (end_idx - start_idx + 1)
        + list(range(1, length - end_idx))
    )


@dataclass
class Example:
    words: np.ndarray          # [L] int32 token ids, or [L, D] float32 (BERT)
    pos: np.ndarray            # [L] int32
    ner: Optional[np.ndarray]  # [L] int32 (TACRED only)
    deprel: np.ndarray         # [L] int32
    head: np.ndarray           # [L] int32 (1-indexed, 0 = root)
    subj_pos: np.ndarray       # [L] int32
    obj_pos: np.ndarray        # [L] int32
    relation: int
    graph: Optional[PrunedGraph]

    @property
    def length(self) -> int:
        return int(self.pos.shape[0])


def constants_for(dataset: str):
    return tacred_constants if dataset == "tacred" else semeval_constants


class RelationDataset:
    """Load + preprocess a TACRED/SemEval JSON file.

    Mirrors reference preprocessing (``data/loader.py:44-72`` and
    ``data/semeval_loader.py:44-66``): lowercasing, SUBJ-/OBJ- entity
    anonymization (TACRED only), UNK mapping, position sequences.  Trees are
    pruned here once per example.
    """

    def __init__(
        self,
        filename: str,
        cfg: Config,
        vocab: Vocab,
        evaluation: bool = False,
        bert_embeddings: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.vocab = vocab
        self.evaluation = evaluation
        self.dataset = cfg.model.dataset
        self.C = constants_for(self.dataset)
        self.label2id = self.C.LABEL_TO_ID
        self.id2label = {v: k for k, v in self.label2id.items()}
        self.bert_embeddings = bert_embeddings

        with open(filename) as f:
            data = json.load(f)
        self.raw_data = data
        self.examples = [self._preprocess(d) for d in data]
        self._attach_graphs()

    def _attach_graphs(self) -> None:
        """Prune all trees — batched through the native C++ builder when
        available (gcn_tpu.graph.native), else per-example Python."""
        from gcn_tpu.graph import native as native_mod

        k = self.cfg.model.prune_k
        if not self.examples:
            return
        if not native_mod.native_available():
            for ex in self.examples:
                ex.graph = prune_graph(
                    ex.head, ex.deprel, ex.length, k, ex.subj_pos,
                    ex.obj_pos,
                )
            return
        b = len(self.examples)
        n = max(ex.length for ex in self.examples)
        heads = np.zeros((b, n), np.int32)
        deprels = np.zeros((b, n), np.int32)
        subj = np.full((b, n), 10**6, np.int32)
        obj = np.full((b, n), 10**6, np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, ex in enumerate(self.examples):
            L = ex.length
            heads[i, :L] = ex.head
            deprels[i, :L] = ex.deprel
            subj[i, :L] = ex.subj_pos
            obj[i, :L] = ex.obj_pos
            lengths[i] = L
        ep, ec, ed, em, keep, ne, roots = (
            native_mod.prune_graph_batch_native(
                heads, deprels, subj, obj, lengths, k
            )
        )
        for i, ex in enumerate(self.examples):
            cnt = int(ne[i])
            ex.graph = PrunedGraph(
                edge_parent=ep[i, :cnt].copy(),
                edge_child=ec[i, :cnt].copy(),
                edge_deprel=ed[i, :cnt].copy(),
                keep=keep[i, : ex.length].copy(),
                dist=np.full(ex.length, -1, np.int32),
                root=int(roots[i]),
            )

    def _preprocess(self, d: dict) -> Example:
        C = self.C
        tokens = list(d["token"])
        if self.cfg.train.lower:
            tokens = [t.lower() for t in tokens]
        ss, se = d["subj_start"], d["subj_end"]
        os_, oe = d["obj_start"], d["obj_end"]
        if self.dataset == "tacred":
            # anonymize entities (data/loader.py:53-56)
            tokens[ss : se + 1] = ["SUBJ-" + d["subj_type"]] * (se - ss + 1)
            tokens[os_ : oe + 1] = ["OBJ-" + d["obj_type"]] * (oe - os_ + 1)

        if self.bert_embeddings is not None:
            words = np.asarray(self.bert_embeddings[d["id"]], dtype=np.float32)
        else:
            words = np.asarray(self.vocab.map(tokens), dtype=np.int32)

        pos = np.asarray(map_to_ids(d["stanford_pos"], C.POS_TO_ID), dtype=np.int32)
        ner = None
        if self.dataset == "tacred":
            ner = np.asarray(
                map_to_ids(d["stanford_ner"], tacred_constants.NER_TO_ID),
                dtype=np.int32,
            )
        deprel = np.asarray(
            map_to_ids(d["stanford_deprel"], C.DEPREL_TO_ID), dtype=np.int32
        )
        head = np.asarray([int(x) for x in d["stanford_head"]], dtype=np.int32)
        assert (head == 0).any(), "dependency tree has no root"
        length = len(pos)
        subj_pos = np.asarray(get_positions(ss, se, length), dtype=np.int32)
        obj_pos = np.asarray(get_positions(os_, oe, length), dtype=np.int32)
        graph = None  # attached in batch by _attach_graphs()
        return Example(
            words=words,
            pos=pos,
            ner=ner,
            deprel=deprel,
            head=head,
            subj_pos=subj_pos,
            obj_pos=obj_pos,
            relation=self.label2id[d["relation"]],
            graph=graph,
        )

    def __len__(self) -> int:
        return len(self.examples)


class _BatcherBase:
    """Iteration/caching/scoring surface shared by ``Batcher`` and
    ``PackedBatcher`` (both expose: ``chunks``, ``gold_labels``,
    ``evaluation``, ``halo_devices``, ``_cache``, ``materialize``)."""

    def gold(self) -> list[str]:
        """Gold labels in iteration order (reference ``data/loader.py:74-76``)."""
        return self.gold_labels

    def __len__(self) -> int:
        return len(self.chunks)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        if not self.evaluation:
            # training batches re-sample word->UNK dropout every epoch
            # (reference data/loader.py:97-100) — never cached
            for chunk in self.chunks:
                yield self.materialize(chunk)
        elif self._cache is not None:
            yield from self._cache
        else:
            cache = []
            for chunk in self.chunks:
                batch = self.materialize(chunk)
                cache.append(batch)
                yield batch
            self._cache = cache

    # Plans depend only on the edge structure, which is epoch-invariant
    # per chunk (only word→UNK dropout re-samples between epochs), so they
    # are cached across epochs keyed by a hash of the edge arrays.  The
    # cache stops growing at this byte budget (large-corpus guard: plans
    # are ~0.5 MB/batch at flagship shapes × one entry per chunk); misses
    # past the budget just rebuild — the vectorized builder is cheap.
    _HALO_CACHE_BUDGET = 256 << 20

    def _attach_halo(self, batch: dict, n: int) -> dict:
        # graph_partition=halo: carry static-shape exchange plans for a
        # `model` axis of halo_devices shards (set by the driver)
        if self.halo_devices <= 1:
            return batch
        from hashlib import blake2b

        from gcn_tpu.parallel.halo import attach_halo_plans

        hsh = blake2b(digest_size=16)
        for f in ("edge_parent", "edge_child", "edge_mask"):
            a = np.ascontiguousarray(batch[f])
            hsh.update(str(a.shape).encode())
            hsh.update(a.tobytes())
        key = (hsh.hexdigest(), n, self.halo_devices)
        cache = getattr(self, "_halo_plan_cache", None)
        if cache is None:
            cache = self._halo_plan_cache = {}
            self._halo_cache_bytes = 0
        hit = cache.get(key)
        if hit is not None:
            out = dict(batch)
            out.update(hit)
            return out
        full = attach_halo_plans(batch, n, self.halo_devices)
        plans = {k: v for k, v in full.items() if k.startswith("hplan_")}
        size = sum(v.nbytes for v in plans.values())
        if self._halo_cache_bytes + size <= self._HALO_CACHE_BUDGET:
            cache[key] = plans
            self._halo_cache_bytes += size
        else:
            # budget exhausted: these chunks rebuild their plans every
            # epoch from here on — say so once (and count), so the
            # large-corpus degradation is visible instead of silent
            self._halo_cache_misses = getattr(
                self, "_halo_cache_misses", 0) + 1
            if self._halo_cache_misses == 1:
                import sys

                print(
                    f"[gcn_tpu] halo-plan cache budget "
                    f"({self._HALO_CACHE_BUDGET >> 20} MB) exhausted at "
                    f"{len(cache)} chunks; further chunks rebuild plans "
                    f"each epoch (vectorized builder, ~ms/chunk)",
                    file=sys.stderr, flush=True)
        return full


class Batcher(_BatcherBase):
    """Chunk a dataset into static-shape padded batches.

    Training order follows the reference: shuffle once at construction, then
    fixed chunks each epoch (``data/loader.py:31-41``).  Word→UNK dropout is
    re-sampled at every materialization, as in ``data/loader.py:97-100``.
    """

    def __init__(
        self,
        dataset: RelationDataset,
        batch_size: int,
        evaluation: bool = False,
        seed: int = 1234,
        length_buckets: Optional[list[int]] = None,
        pad_batches: bool = True,
        group_by_length: bool = False,
    ):
        self.ds = dataset
        self.cfg = dataset.cfg
        self.batch_size = batch_size
        self.evaluation = evaluation
        self.rng = np.random.RandomState(seed)
        self.pad_batches = pad_batches
        buckets = length_buckets or list(self.cfg.data.length_buckets)
        self.length_buckets = sorted(buckets)

        order = list(range(len(dataset)))
        if not evaluation:
            random.Random(seed).shuffle(order)
        if group_by_length:
            # Stable-sort by bucketed length so same-bucket examples batch
            # together — large padding-waste reduction vs the reference's
            # shuffle-then-chunk (every mixed batch pads to the corpus
            # max).  The shuffle above still randomizes order within each
            # bucket; `gold()` follows this iteration order so scoring is
            # unaffected.
            order = sorted(
                order,
                key=lambda i: self._bucket_len(
                    dataset.examples[i].length
                ),
            )
        self.order = order
        self.gold_labels = [
            dataset.id2label[dataset.examples[i].relation] for i in order
        ]
        self.chunks = [
            order[i : i + batch_size] for i in range(0, len(order), batch_size)
        ]
        self.num_examples = len(order)
        # graph_partition=halo: when set (>1, by the driver after mesh
        # construction), every materialized batch carries static-shape
        # fwd+rev halo exchange plans (parallel.halo.attach_halo_plans)
        # for a `model` axis of this many devices
        self.halo_devices = 0
        # eval batches are deterministic (no word dropout, fixed order), so
        # they are materialized once and replayed — the driver evaluates
        # train/dev/test every epoch, and at ~0.7 ms/batch the per-example
        # padding loop is on par with the device forward itself
        self._cache: Optional[list] = None

    def warmup_batches(self) -> list[dict]:
        """One representative batch per distinct compiled batch shape.

        Used by ``Trainer.warmup`` to pre-compile the run's programs.
        Shape signatures are computed from the chunks without
        materializing, and the few representatives are materialized with a
        THROWAWAY RNG — the training word-dropout stream (``self.rng``)
        is untouched, so a warmed run stays bit-identical to an un-warmed
        one; the eval cache is likewise not populated here.
        """
        reps: list[dict] = []
        seen: set = set()
        saved_rng = self.rng
        try:
            self.rng = np.random.RandomState(0)
            for chunk in self.chunks:
                n = self._bucket_len(
                    max(self.ds.examples[i].length for i in chunk)
                )
                pad_b = self.batch_size if self.pad_batches else len(chunk)
                if (pad_b, n) in seen:
                    continue
                seen.add((pad_b, n))
                reps.append(self.materialize(chunk))
        finally:
            self.rng = saved_rng
        return reps

    def _bucket_len(self, max_len: int) -> int:
        for b in self.length_buckets:
            if max_len <= b:
                return b
        return max_len  # beyond the largest bucket: pad to actual max

    def materialize(self, chunk: list[int]) -> dict[str, np.ndarray]:
        cfg = self.cfg
        exs = [self.ds.examples[i] for i in chunk]
        bsz = len(exs)
        pad_b = self.batch_size if self.pad_batches else bsz
        n = self._bucket_len(max(e.length for e in exs))
        e_cap = n  # a tree over n tokens has < n edges
        use_bert = exs[0].words.ndim == 2

        if use_bert:
            emb_d = exs[0].words.shape[-1]
            words = np.zeros((pad_b, n, emb_d), dtype=np.float32)
        else:
            words = np.full((pad_b, n), tacred_constants.PAD_ID, dtype=np.int32)
        pos = np.zeros((pad_b, n), dtype=np.int32)
        ner = np.zeros((pad_b, n), dtype=np.int32)
        deprel = np.zeros((pad_b, n), dtype=np.int32)
        subj_mask = np.zeros((pad_b, n), dtype=bool)
        obj_mask = np.zeros((pad_b, n), dtype=bool)
        pad_mask = np.ones((pad_b, n), dtype=bool)
        lengths = np.zeros((pad_b,), dtype=np.int32)
        labels = np.zeros((pad_b,), dtype=np.int32)
        example_mask = np.zeros((pad_b,), dtype=bool)
        edge_parent = np.zeros((pad_b, e_cap), dtype=np.int32)
        edge_child = np.zeros((pad_b, e_cap), dtype=np.int32)
        edge_deprel = np.zeros((pad_b, e_cap), dtype=np.int32)
        edge_mask = np.zeros((pad_b, e_cap), dtype=bool)

        word_do = cfg.train.word_dropout if not self.evaluation else 0.0
        for b, ex in enumerate(exs):
            L = ex.length
            w = ex.words
            if word_do > 0 and not use_bert:
                # reference data/loader.py:182-189: UNK substitution, never
                # re-dropping existing UNKs
                drop = (self.rng.random_sample(L) < word_do) & (
                    w != tacred_constants.UNK_ID
                )
                w = np.where(drop, tacred_constants.UNK_ID, w)
            words[b, :L] = w
            pos[b, :L] = ex.pos
            if ex.ner is not None:
                ner[b, :L] = ex.ner
            deprel[b, :L] = ex.deprel
            subj_mask[b, :L] = ex.subj_pos == 0
            obj_mask[b, :L] = ex.obj_pos == 0
            pad_mask[b, :L] = False
            lengths[b] = L
            labels[b] = ex.relation
            example_mask[b] = True
            g = ex.graph
            ne = g.num_edges
            edge_parent[b, :ne] = g.edge_parent
            edge_child[b, :ne] = g.edge_child
            edge_deprel[b, :ne] = g.edge_deprel
            edge_mask[b, :ne] = True

        batch = {
            "words": words,
            "pad_mask": pad_mask,
            "pos": pos,
            "deprel": deprel,
            "subj_mask": subj_mask,
            "obj_mask": obj_mask,
            "lengths": lengths,
            "labels": labels,
            "example_mask": example_mask,
            "edge_parent": edge_parent,
            "edge_child": edge_child,
            "edge_deprel": edge_deprel,
            "edge_mask": edge_mask,
        }
        if self.ds.dataset == "tacred":
            batch["ner"] = ner
        return self._attach_halo(batch, n)


class PackedBatcher(_BatcherBase):
    """Cross-sentence packing: several sentences share one node row.

    The padded-row layout wastes most of the MXU on short sentences (mean
    TACRED length ~36 against a 96-token bucket); here rows are filled
    greedily with whole sentences up to ``pack_len`` tokens / ``max_slots``
    sentences, so one [rows, pack_len] program carries ~2-3x the examples
    of the one-sentence-per-row layout at the same FLOPs.  Purely a
    throughput mode — per-example math is unchanged:

    * edges are offset into the packed coordinates (block-diagonal forest;
      the edge-list aggregation ops never see row boundaries),
    * the BiLSTM resets its carry at ``seg_start`` boundaries
      (ops.lstm._segment_resets) — bit-identical to per-sentence rows,
    * pooling/classification run per SLOT (``slot_mask``/``subj_mask``/
      ``obj_mask`` are [B,S,N]); ``labels``/``example_mask`` are flattened
      [B·S] in row-major slot order so the trainer/scorer path is
      untouched.

    The reference has no analog (its dense [B,N,N] adjacency is one
    sentence per row by construction, reference ``model/gcn.py:269``).
    """

    def __init__(
        self,
        dataset: RelationDataset,
        rows_per_batch: int,
        pack_len: Optional[int] = None,
        max_slots: int = 10,
        evaluation: bool = False,
        seed: int = 1234,
    ):
        self.ds = dataset
        self.cfg = dataset.cfg
        self.evaluation = evaluation
        self.rng = np.random.RandomState(seed)
        self.rows_per_batch = rows_per_batch
        buckets = sorted(self.cfg.data.length_buckets)
        max_len = max((ex.length for ex in dataset.examples), default=1)
        self.pack_len = max(pack_len or buckets[-1], max_len)
        self.max_slots = max_slots

        order = list(range(len(dataset)))
        if not evaluation:
            random.Random(seed).shuffle(order)
        rows: list[list[int]] = []
        cur: list[int] = []
        filled = 0
        for i in order:
            length = dataset.examples[i].length
            if cur and (filled + length > self.pack_len
                        or len(cur) >= max_slots):
                rows.append(cur)
                cur, filled = [], 0
            cur.append(i)
            filled += length
        if cur:
            rows.append(cur)
        self.rows = rows
        # flattened example order (row-major, slots in fill order) — this
        # is the order gold()/predictions/misclassified dumps follow
        self.order = [i for row in rows for i in row]
        self.gold_labels = [
            dataset.id2label[dataset.examples[i].relation]
            for i in self.order
        ]
        self.chunks = [
            rows[j : j + rows_per_batch]
            for j in range(0, len(rows), rows_per_batch)
        ]
        self.num_examples = len(self.order)
        self.batch_size = rows_per_batch  # rows, not examples
        self.halo_devices = 0
        self._cache: Optional[list] = None

    def warmup_batches(self) -> list[dict]:
        if not self.chunks:
            return []
        saved = self.rng
        try:
            self.rng = np.random.RandomState(0)
            return [self.materialize(self.chunks[0])]
        finally:
            self.rng = saved

    def materialize(self, chunk: list[list[int]]) -> dict[str, np.ndarray]:
        cfg = self.cfg
        b = self.rows_per_batch
        n = self.pack_len
        s = self.max_slots
        words = np.full((b, n), tacred_constants.PAD_ID, np.int32)
        pos = np.zeros((b, n), np.int32)
        ner = np.zeros((b, n), np.int32)
        deprel = np.zeros((b, n), np.int32)
        pad_mask = np.ones((b, n), bool)
        seg_start = np.zeros((b, n), bool)
        lengths = np.zeros((b,), np.int32)
        slot_mask = np.zeros((b, s, n), bool)
        subj_mask = np.zeros((b, s, n), bool)
        obj_mask = np.zeros((b, s, n), bool)
        labels = np.zeros((b, s), np.int32)
        example_mask = np.zeros((b, s), bool)
        e_cap = n
        edge_parent = np.zeros((b, e_cap), np.int32)
        edge_child = np.zeros((b, e_cap), np.int32)
        edge_deprel = np.zeros((b, e_cap), np.int32)
        edge_mask = np.zeros((b, e_cap), bool)

        word_do = cfg.train.word_dropout if not self.evaluation else 0.0
        for r, row in enumerate(chunk):
            off = 0
            ne_off = 0
            for si, i in enumerate(row):
                ex = self.ds.examples[i]
                length = ex.length
                w = ex.words
                if word_do > 0:
                    drop = (self.rng.random_sample(length) < word_do) & (
                        w != tacred_constants.UNK_ID
                    )
                    w = np.where(drop, tacred_constants.UNK_ID, w)
                sl = slice(off, off + length)
                words[r, sl] = w
                pos[r, sl] = ex.pos
                if ex.ner is not None:
                    ner[r, sl] = ex.ner
                deprel[r, sl] = ex.deprel
                pad_mask[r, sl] = False
                seg_start[r, off] = True
                slot_mask[r, si, sl] = True
                subj_mask[r, si, sl] = ex.subj_pos == 0
                obj_mask[r, si, sl] = ex.obj_pos == 0
                labels[r, si] = ex.relation
                example_mask[r, si] = True
                g = ex.graph
                ne = g.num_edges
                edge_parent[r, ne_off : ne_off + ne] = g.edge_parent + off
                edge_child[r, ne_off : ne_off + ne] = g.edge_child + off
                edge_deprel[r, ne_off : ne_off + ne] = g.edge_deprel
                edge_mask[r, ne_off : ne_off + ne] = True
                ne_off += ne
                off += length
            lengths[r] = off

        batch = {
            "words": words,
            "pad_mask": pad_mask,
            "pos": pos,
            "deprel": deprel,
            "seg_start": seg_start,
            "slot_mask": slot_mask,
            "subj_mask": subj_mask,
            "obj_mask": obj_mask,
            "lengths": lengths,
            "labels": labels.reshape(-1),
            "example_mask": example_mask.reshape(-1),
            "edge_parent": edge_parent,
            "edge_child": edge_child,
            "edge_deprel": edge_deprel,
            "edge_mask": edge_mask,
        }
        if self.ds.dataset == "tacred":
            batch["ner"] = ner
        return self._attach_halo(batch, n)
