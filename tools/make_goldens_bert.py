"""Golden fixture for the BERT (precomputed float embedding) input branch.

Separate from make_goldens.py so re-running doesn't churn the existing
committed fixtures.  Runs the reference with float word inputs
(reference ``model/gcn.py:235-236``: rank-3 words are used directly).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REF)

import torch  # noqa: E402

sys.path.insert(0, REPO)
from tools.make_goldens import BASE_OPT, encode, load_samples  # noqa: E402

from model.gcn import GCNClassifier  # noqa: E402


def main():
    torch.manual_seed(99)
    np.random.seed(99)
    exs = load_samples()[:6]
    maxlen = max(len(e["stanford_head"]) for e in exs)
    emb_dim = 32
    opt = dict(BASE_OPT, rnn=True, use_bert_embeddings=True,
               emb_dim=emb_dim)

    b = len(exs)
    rng = np.random.RandomState(5)
    words = np.zeros((b, maxlen, emb_dim), np.float32)
    pos = np.zeros((b, maxlen), np.int64)
    ner = np.zeros((b, maxlen), np.int64)
    deprel = np.zeros((b, maxlen), np.int64)
    head = np.zeros((b, maxlen), np.int64)
    subj_pos = np.full((b, maxlen), 150, np.int64)
    obj_pos = np.full((b, maxlen), 150, np.int64)
    masks = np.ones((b, maxlen), bool)
    for i, ex in enumerate(exs):
        h, d, s, o, n = encode(ex)
        words[i, :n] = rng.randn(n, emb_dim)
        pos[i, :n] = rng.randint(2, 47, n)
        ner[i, :n] = rng.randint(2, 15, n)
        deprel[i, :n] = d
        head[i, :n] = h
        subj_pos[i, :n] = s
        obj_pos[i, :n] = o
        masks[i, :n] = False

    model = GCNClassifier(opt)
    model.eval()
    t = lambda x: torch.from_numpy(x)  # noqa: E731
    inputs = (t(words), t(masks), t(pos), t(ner), t(deprel), t(head),
              t(subj_pos), t(obj_pos))
    with torch.no_grad():
        logits, pooled = model(inputs)
    payload = {
        f"state.{k}": v.detach().numpy() for k, v in model.state_dict().items()
    }
    payload.update({
        "in.words": words, "in.masks": masks, "in.pos": pos, "in.ner": ner,
        "in.deprel": deprel, "in.head": head, "in.subj_pos": subj_pos,
        "in.obj_pos": obj_pos,
        "out.logits": logits.numpy(), "out.pooled": pooled.numpy(),
        "opt": np.frombuffer(json.dumps(opt).encode(), dtype=np.uint8),
    })
    np.savez_compressed(os.path.join(OUT, "model_bert_rnn.npz"), **payload)
    print("bert golden:", logits.shape)


if __name__ == "__main__":
    main()
