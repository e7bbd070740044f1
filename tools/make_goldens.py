"""Generate parity fixtures by RUNNING the reference implementation.

This script executes the reference repo (read-only at /root/reference) on the
checked-in 20-example sample JSONs and snapshots inputs/weights/outputs into
``tests/goldens/*.npz``.  The fixtures are committed; tests never import the
reference.  Re-run only if fixtures need regenerating:

    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)
np.random.seed(0)

from model.tree import head_to_tree, tree_to_adj  # noqa: E402
from model.gcn import GCNClassifier  # noqa: E402


# --------------------------------------------------------------- sample data
def load_samples():
    exs = []
    for split in ("train", "dev", "test"):
        with open(f"{REF}/dataset/tacred/{split}.json") as f:
            exs.extend(json.load(f))
    return exs


def positions(start, end, length):
    return (
        list(range(-start, 0))
        + [0] * (end - start + 1)
        + list(range(1, length - end))
    )


DEPREL_TO_ID = None


def encode(ex):
    global DEPREL_TO_ID
    if DEPREL_TO_ID is None:
        from utils import constant

        DEPREL_TO_ID = constant.DEPREL_TO_ID
    deprel = np.array(
        [DEPREL_TO_ID.get(d, 1) for d in ex["stanford_deprel"]], np.int64
    )
    head = np.array([int(x) for x in ex["stanford_head"]], np.int64)
    n = len(head)
    subj = np.array(positions(ex["subj_start"], ex["subj_end"], n), np.int64)
    obj = np.array(positions(ex["obj_start"], ex["obj_end"], n), np.int64)
    return head, deprel, subj, obj, n


# ------------------------------------------------------------ prune goldens
def make_prune_goldens():
    exs = load_samples()
    records = []
    for i, ex in enumerate(exs):
        head, deprel, subj, obj, n = encode(ex)
        tokens = np.arange(n)
        for k in (0, 1, 2, 5, 100):
            tree = head_to_tree(head, tokens, n, k, subj, obj, deprel)
            adj = tree_to_adj(n, tree, directed=False, self_loop=True)
            records.append(
                dict(example=i, prune=k, n=n, head=head, deprel=deprel,
                     subj_pos=subj, obj_pos=obj, adj=adj)
            )
    np.savez_compressed(
        os.path.join(OUT, "prune_goldens.npz"),
        num=len(records),
        **{
            f"{name}_{j}": rec[name]
            for j, rec in enumerate(records)
            for name in ("example", "prune", "n", "head", "deprel",
                         "subj_pos", "obj_pos", "adj")
        },
    )
    print(f"prune goldens: {len(records)} records")


# ------------------------------------------------------------ model goldens
BASE_OPT = dict(
    vocab_size=400, emb_dim=60, pos_dim=12, ner_dim=8, hidden_dim=40,
    num_layers=2, input_dropout=0.0, gcn_dropout=0.0, word_dropout=0.0,
    topn=0, prune_k=1, pooling="max", mlp_layers=2, cuda=False,
    adj_type="regular", deprel_emb_dim=16, deprel_self_loop=True,
    deprel_directed=False, emb_dropout=0.0, dataset="tacred",
    deprel_max_depth=2, num_class=42, no_adj=False, rnn=False,
    rnn_hidden=20, rnn_layers=1, rnn_dropout=0.0, edge_keep_prob=1.0,
    deprel_keep_prop=1.0, deprel_alpha=1.0,
)


def build_batch(exs, vocab_size, maxlen):
    b = len(exs)
    words = np.zeros((b, maxlen), np.int64)
    pos = np.zeros((b, maxlen), np.int64)
    ner = np.zeros((b, maxlen), np.int64)
    deprel = np.zeros((b, maxlen), np.int64)
    head = np.zeros((b, maxlen), np.int64)
    subj_pos = np.full((b, maxlen), 150, np.int64)
    obj_pos = np.full((b, maxlen), 150, np.int64)
    masks = np.ones((b, maxlen), bool)
    rng = np.random.RandomState(7)
    for i, ex in enumerate(exs):
        h, d, s, o, n = encode(ex)
        words[i, :n] = rng.randint(2, vocab_size, n)
        pos[i, :n] = rng.randint(2, 47, n)
        ner[i, :n] = rng.randint(2, 15, n)
        deprel[i, :n] = d
        head[i, :n] = h
        subj_pos[i, :n] = s
        obj_pos[i, :n] = o
        masks[i, :n] = False
    return dict(words=words, masks=masks, pos=pos, ner=ner, deprel=deprel,
                head=head, subj_pos=subj_pos, obj_pos=obj_pos)


def make_model_goldens():
    exs = load_samples()[:8]
    maxlen = max(len(e["stanford_head"]) for e in exs)

    configs = {
        "regular_nornn": dict(BASE_OPT),
        "regular_rnn": dict(BASE_OPT, rnn=True),
        "diagonal_nornn": dict(BASE_OPT, adj_type="diagonal_deprel"),
        # shared full_deprel needs 2*rnn_hidden == hidden_dim
        "full_rnn": dict(BASE_OPT, adj_type="full_deprel", rnn=True,
                         rnn_hidden=20, hidden_dim=40),
        "full_rnn_depth0": dict(BASE_OPT, adj_type="full_deprel", rnn=True,
                                rnn_hidden=20, hidden_dim=40,
                                deprel_max_depth=0),
        "full_rnn_directed": dict(BASE_OPT, adj_type="full_deprel", rnn=True,
                                  rnn_hidden=20, hidden_dim=40,
                                  deprel_directed=True),
        "regular_noadj": dict(BASE_OPT, no_adj=True),
        "regular_avg": dict(BASE_OPT, pooling="avg"),
        "regular_sum": dict(BASE_OPT, pooling="sum"),
        "regular_rnn2l": dict(BASE_OPT, rnn=True, rnn_layers=2),
    }

    batch_np = build_batch(exs, BASE_OPT["vocab_size"], maxlen)
    for name, opt in configs.items():
        torch.manual_seed(hash(name) % (2**31))
        model = GCNClassifier(opt)
        model.eval()
        t = {k: torch.from_numpy(v) for k, v in batch_np.items()}
        inputs = (t["words"], t["masks"], t["pos"], t["ner"], t["deprel"],
                  t["head"], t["subj_pos"], t["obj_pos"])
        with torch.no_grad():
            logits, pooled = model(inputs)
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        payload = {f"state.{k}": v for k, v in state.items()}
        payload.update({f"in.{k}": v for k, v in batch_np.items()})
        payload["out.logits"] = logits.numpy()
        payload["out.pooled"] = pooled.numpy()
        payload["opt"] = np.frombuffer(
            json.dumps(opt).encode(), dtype=np.uint8
        )
        np.savez_compressed(os.path.join(OUT, f"model_{name}.npz"), **payload)
        print(f"model golden {name}: logits {logits.shape}")


# ------------------------------------------------------------- LSTM goldens
def make_lstm_goldens():
    torch.manual_seed(3)
    B, T, D, H, L = 5, 13, 9, 11, 2
    lstm = torch.nn.LSTM(D, H, L, batch_first=True, bidirectional=True,
                         dropout=0.0)
    x = torch.randn(B, T, D)
    lengths = torch.tensor([13, 10, 7, 4, 1])
    h0 = torch.zeros(2 * L, B, H)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, list(lengths), batch_first=True, enforce_sorted=False
    )
    out, _ = lstm(packed, (h0, h0))
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T
    )
    payload = {
        f"state.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()
    }
    payload.update(
        x=x.numpy(), lengths=lengths.numpy(), out=out.detach().numpy(),
        dims=np.array([B, T, D, H, L]),
    )
    np.savez_compressed(os.path.join(OUT, "lstm.npz"), **payload)
    print("lstm golden:", out.shape)


# --------------------------------------------------------- optimizer golden
def make_adagrad_golden():
    sys.path.insert(0, REF)
    from utils.torch_utils import MyAdagrad

    torch.manual_seed(11)
    w = torch.nn.Parameter(torch.randn(6, 4))
    target = torch.randn(6, 4)
    optim = MyAdagrad([w], lr=0.3, init_accu_value=0.1)
    traj = [w.detach().numpy().copy()]
    grads = []
    for _ in range(5):
        optim.zero_grad()
        loss = ((w - target) ** 2).sum() + 0.1 * w.abs().sum()
        loss.backward()
        grads.append(w.grad.detach().numpy().copy())
        optim.step()
        traj.append(w.detach().numpy().copy())
    np.savez_compressed(
        os.path.join(OUT, "adagrad.npz"),
        init=traj[0], target=target.numpy(),
        grads=np.stack(grads), traj=np.stack(traj[1:]),
    )
    print("adagrad golden: 5 steps")


if __name__ == "__main__":
    make_prune_goldens()
    make_model_goldens()
    make_lstm_goldens()
    make_adagrad_golden()
