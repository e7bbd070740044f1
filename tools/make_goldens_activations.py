"""Intermediate-activation golden fixtures (per-layer parity, VERDICT §3).

Captures the reference's internal activations with forward hooks on its
dropout modules — identity in eval mode, and placed exactly at the layer
boundaries of ``model/gcn.py:229-393``:

* ``in_drop``  → embedding-concat output (GCN stack input before the RNN),
* ``rnn_drop`` → BiLSTM output,
* ``gcn_drop`` → each non-final GCN layer's post-ReLU output
  (the final layer feeds pooling directly, pinned by the whole-model
  goldens).

The gcn_tpu model sows the same tensors (``models/gcn.py``); the test
compares them position-by-position, which localizes any future regression
to a specific layer instead of a whole-model diff.

    python tools/make_goldens_activations.py
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
sys.path.insert(0, REPO)

import torch  # noqa: E402

from tools.make_goldens import BASE_OPT, build_batch, load_samples  # noqa: E402

from model.gcn import GCNClassifier  # noqa: E402


def main():
    exs = load_samples()[:8]
    maxlen = max(len(e["stanford_head"]) for e in exs)
    batch_np = build_batch(exs, BASE_OPT["vocab_size"], maxlen)
    configs = {
        "act_regular_rnn": dict(BASE_OPT, rnn=True, num_layers=3),
        "act_full_rnn": dict(BASE_OPT, adj_type="full_deprel", rnn=True,
                             rnn_hidden=20, hidden_dim=40, num_layers=3),
        "act_diagonal": dict(BASE_OPT, adj_type="diagonal_deprel",
                             num_layers=3),
    }
    for name, opt in configs.items():
        torch.manual_seed(hash(name) % (2**31))
        model = GCNClassifier(opt)
        model.eval()
        gcn = model.gcn_model.gcn

        captures: dict[str, list[np.ndarray]] = {}

        def hook(tag):
            def fn(_m, _inp, out):
                captures.setdefault(tag, []).append(
                    out.detach().numpy().copy()
                )

            return fn

        gcn.in_drop.register_forward_hook(hook("in_drop"))
        if opt["rnn"]:
            gcn.rnn_drop.register_forward_hook(hook("rnn_drop"))
        gcn.gcn_drop.register_forward_hook(hook("gcn_drop"))

        t = {k: torch.from_numpy(v) for k, v in batch_np.items()}
        inputs = (t["words"], t["masks"], t["pos"], t["ner"], t["deprel"],
                  t["head"], t["subj_pos"], t["obj_pos"])
        with torch.no_grad():
            logits, pooled = model(inputs)

        state = {k: v.detach().numpy()
                 for k, v in model.state_dict().items()}
        payload = {f"state.{k}": v for k, v in state.items()}
        payload.update({f"in.{k}": v for k, v in batch_np.items()})
        payload["out.logits"] = logits.numpy()
        for tag, vals in captures.items():
            for i, v in enumerate(vals):
                payload[f"act.{tag}.{i}"] = v
        payload["opt"] = np.frombuffer(
            json.dumps(opt).encode(), dtype=np.uint8
        )
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **payload)
        print(name, {k: len(v) for k, v in captures.items()})


if __name__ == "__main__":
    main()
