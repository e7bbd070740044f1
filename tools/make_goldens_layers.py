"""Single-layer golden fixtures — direct per-layer parity evidence.

Runs the reference with ``num_layers=1`` for each aggregation mode, so the
model output IS the first GCN layer's (pooled+classified) activation.
Together with the committed 2-layer whole-model goldens this pins each
layer's semantics individually (BASELINE.md's per-layer allclose gate).
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
        "l1_regular": dict(BASE_OPT, num_layers=1),
        "l1_diagonal": dict(BASE_OPT, num_layers=1,
                            adj_type="diagonal_deprel"),
        "l1_full": dict(BASE_OPT, num_layers=1, adj_type="full_deprel",
                        rnn=True, rnn_hidden=20, hidden_dim=40),
        "l3_regular": dict(BASE_OPT, num_layers=3),
    }
    for name, opt in configs.items():
        torch.manual_seed(abs(hash(name)) % (2**31))
        model = GCNClassifier(opt)
        model.eval()
        t = {k: torch.from_numpy(v) for k, v in batch_np.items()}
        inputs = (t["words"], t["masks"], t["pos"], t["ner"], t["deprel"],
                  t["head"], t["subj_pos"], t["obj_pos"])
        with torch.no_grad():
            logits, pooled = model(inputs)
        payload = {
            f"state.{k}": v.detach().numpy()
            for k, v in model.state_dict().items()
        }
        payload.update({f"in.{k}": v for k, v in batch_np.items()})
        payload["out.logits"] = logits.numpy()
        payload["out.pooled"] = pooled.numpy()
        payload["opt"] = np.frombuffer(
            json.dumps(opt).encode(), dtype=np.uint8
        )
        np.savez_compressed(os.path.join(OUT, f"model_{name}.npz"),
                            **payload)
        print(f"layer golden {name}: {logits.shape}")


if __name__ == "__main__":
    main()
