"""Measure the PyTorch reference's training-step throughput (the bench.py
baseline — this script is the provenance of ``REFERENCE_EDGES_PER_SEC``).

Runs the actual reference implementation (/root/reference, imported and
executed, not copied) on this machine's CPU — its only non-CUDA backend
(reference ``train.py:93-94``) — with the benchmark workload: B=50
sentences, padded N=96, the same synthetic forest ``bench.py`` uses, C-GCN
with shared-W full_deprel aggregation.  The reference's single shared
bilinear weight requires ``2*rnn_hidden == hidden_dim`` for stacked layers
(``model/gcn.py:164-167``), so the reference runs rnn_hidden=100 /
hidden=200 — slightly LESS work than the gcn_tpu flagship's rnn_hidden=200
with per-layer weights, which biases the comparison in the reference's
favor.

One step = forward (including the per-forward host tree build+prune,
``model/gcn.py:102-112``) + CE loss + pooling_l2 penalty + backward + grad
clip + SGD step, mirroring ``train.py:220-227`` at update_gap=1.

    python tools/bench_reference.py [--iters 5]

Prints one JSON line with ms/step and edges/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def reference_batch(cfg, b, n):
    """The bench.py synthetic forest re-encoded in the reference's input
    contract: 1-indexed head arrays (0 = root), desc-length sort for
    pack_padded_sequence, entity-relative position sequences."""
    import __graft_entry__ as g

    batch = g._synthetic_batch(cfg, b=b, n=n)
    lengths = batch["lengths"]
    order = np.argsort(-lengths)

    words = np.zeros((b, n), np.int64)
    masks = np.ones((b, n), bool)
    pos = np.zeros((b, n), np.int64)
    ner = np.zeros((b, n), np.int64)
    deprel = np.zeros((b, n), np.int64)
    head = np.zeros((b, n), np.int64)
    subj_pos = np.full((b, n), 150, np.int64)
    obj_pos = np.full((b, n), 150, np.int64)
    for row, i in enumerate(order):
        li = int(lengths[i])
        words[row, :li] = batch["words"][i, :li]
        masks[row, :li] = False
        pos[row, :li] = batch["pos"][i, :li]
        ner[row, :li] = batch["ner"][i, :li]
        deprel[row, :li] = batch["deprel"][i, :li]
        for e in range(n):
            if batch["edge_mask"][i, e]:
                head[row, batch["edge_child"][i, e]] = (
                    batch["edge_parent"][i, e] + 1
                )
        subj = int(np.argmax(batch["subj_mask"][i]))
        obj = int(np.argmax(batch["obj_mask"][i]))
        subj_pos[row, :li] = np.arange(li) - subj
        obj_pos[row, :li] = np.arange(li) - obj
    edges = int(batch["edge_mask"].sum())
    # the reference pads exactly to the batch max (data/loader.py:167-174),
    # not to a static bucket — trim so its dense [B,N,N] math sees the
    # smaller N (biases the comparison in the reference's favor)
    mx = int(lengths.max())
    words, masks, pos, ner, deprel, head, subj_pos, obj_pos = (
        a[:, :mx] for a in
        (words, masks, pos, ner, deprel, head, subj_pos, obj_pos)
    )
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a))  # noqa: E731
    return (
        (t(words), t(masks), t(pos), t(ner), t(deprel), t(head),
         t(subj_pos), t(obj_pos)),
        t(np.random.RandomState(3).randint(0, 42, b).astype(np.int64)),
        edges,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--b", type=int, default=50)
    ap.add_argument("--n", type=int, default=96)
    args = ap.parse_args()

    torch.manual_seed(0)
    from model.gcn import GCNClassifier

    import __graft_entry__ as g

    cfg = g._flagship_cfg()

    opt = dict(
        vocab_size=cfg.model.vocab_size, emb_dim=300, pos_dim=30, ner_dim=30,
        hidden_dim=200, num_layers=2, input_dropout=0.5, gcn_dropout=0.5,
        word_dropout=0.0, topn=1e10, prune_k=1, pooling="max", mlp_layers=2,
        cuda=False, adj_type="full_deprel", deprel_emb_dim=50,
        deprel_self_loop=True, deprel_directed=False, emb_dropout=0.0,
        dataset="tacred", deprel_max_depth=200, num_class=42, no_adj=False,
        rnn=True, rnn_hidden=100, rnn_layers=1, rnn_dropout=0.5,
        edge_keep_prob=1.0, deprel_keep_prop=1.0, deprel_alpha=1.0,
    )
    model = GCNClassifier(opt)
    model.train()
    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.SGD(model.parameters(), lr=0.3)

    inputs, labels, edges = reference_batch(cfg, args.b, args.n)

    def step():
        optimizer.zero_grad()
        logits, pooling_output = model(inputs)
        loss = criterion(logits, labels)
        loss = loss + 0.003 * (pooling_output ** 2).sum(1).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        optimizer.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "reference_cgcn_train_step",
        "ms_per_step": round(dt * 1e3, 1),
        "edges_per_sec": round(edges / dt, 1),
        "edges_per_batch": edges,
        "device": "cpu (reference has no TPU backend)",
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
