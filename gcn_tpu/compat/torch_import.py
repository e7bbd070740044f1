"""Convert reference PyTorch checkpoints to gcn_tpu parameter trees.

Users of the reference (gstoica27/gcn-over-pruned-trees) can migrate a
``best_model.pt`` state dict into this framework.  The mapping is mechanical:
torch ``nn.Linear`` stores ``[out, in]`` weights (transposed here),
``nn.LSTM`` stores per-direction ``weight_ih_l{k}[_reverse]`` in (i,f,g,o)
gate order (kept), and the ``full_deprel`` shared Linear is reinterpreted as
``[D, T, H]`` exactly as the reference does at ``model/gcn.py:301-303``.

Only numpy is required here; pass ``state`` as a dict of numpy arrays
(e.g. ``{k: v.numpy() for k, v in torch.load(f)['model'].items()}``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from gcn_tpu.config import ModelConfig


def torch_state_to_params(
    state: Mapping[str, np.ndarray], cfg: ModelConfig
) -> dict:
    """Build the flax ``{'params': ...}`` tree from a reference state dict."""
    s = {k: np.asarray(v) for k, v in state.items()}
    p: dict = {}

    if not cfg.use_bert_embeddings:
        p["word_emb"] = s["gcn_model.emb.weight"]
    if cfg.pos_dim > 0:
        p["pos_emb"] = s["gcn_model.pos_emb.weight"]
    if cfg.ner_dim > 0 and cfg.dataset == "tacred":
        p["ner_emb"] = s["gcn_model.ner_emb.weight"]
    p["deprel_emb"] = s["gcn_model.deprel_emb.weight"]

    if cfg.rnn:
        rnn = {}
        for li in range(cfg.rnn_layers):
            for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
                rnn[f"l{li}_{d}_w_ih"] = s[
                    f"gcn_model.gcn.rnn.weight_ih_l{li}{suffix}"
                ].T
                rnn[f"l{li}_{d}_w_hh"] = s[
                    f"gcn_model.gcn.rnn.weight_hh_l{li}{suffix}"
                ].T
                rnn[f"l{li}_{d}_b_ih"] = s[
                    f"gcn_model.gcn.rnn.bias_ih_l{li}{suffix}"
                ]
                rnn[f"l{li}_{d}_b_hh"] = s[
                    f"gcn_model.gcn.rnn.bias_hh_l{li}{suffix}"
                ]
        p["rnn"] = rnn

    if cfg.adj_type == "diagonal_deprel":
        p["preprocessor"] = {
            "kernel": s["gcn_model.gcn.preprocessor.weight"].T,
            "bias": s["gcn_model.gcn.preprocessor.bias"],
        }

    if cfg.adj_type == "regular":
        for l in range(cfg.num_layers):
            p[f"gcn_w{l}_kernel"] = s[f"gcn_model.gcn.W.{l}.weight"].T
            p[f"gcn_w{l}_bias"] = s[f"gcn_model.gcn.W.{l}.bias"]
    elif cfg.adj_type == "full_deprel":
        d, h = cfg.deprel_emb_dim, cfg.hidden_dim
        w = s["gcn_model.gcn.W.weight"]  # [D*H, T]
        b = s["gcn_model.gcn.W.bias"]    # [D*H]
        w3 = w.reshape(d, -1, h)         # reference model/gcn.py:301
        b2 = b.reshape(d, h)             # reference model/gcn.py:303
        if cfg.deprel_shared_w:
            p["gcn_deprel_w"] = w3
            p["gcn_deprel_b"] = b2
        else:
            # reference has a single shared weight; replicate across layers
            for l in range(cfg.num_layers):
                p[f"gcn_deprel_w{l}"] = w3
                p[f"gcn_deprel_b{l}"] = b2

    for i in range(cfg.mlp_layers):
        # torch Sequential interleaves ReLU: Linear layers sit at 0, 2, ...
        p[f"mlp{i}"] = {
            "kernel": s[f"gcn_model.out_mlp.{2 * i}.weight"].T,
            "bias": s[f"gcn_model.out_mlp.{2 * i}.bias"],
        }
    p["classifier"] = {
        "kernel": s["classifier.weight"].T,
        "bias": s["classifier.bias"],
    }
    return {"params": p}
