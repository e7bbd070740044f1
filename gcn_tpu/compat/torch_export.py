"""Export gcn_tpu parameters as a reference-compatible torch state dict.

Inverse of ``torch_import``: a model trained here can be loaded by the
original PyTorch implementation (``GCNClassifier.load_state_dict``) for
side-by-side evaluation.  Returns numpy arrays keyed by the reference's
parameter names; callers wrap with ``torch.from_numpy`` as needed.

Only parameterizations the reference can represent are exportable:
``full_deprel`` requires ``deprel_shared_w=True`` (the reference has a
single shared bilinear weight), and the ``attention`` mode has no reference
counterpart.
"""

from __future__ import annotations

import numpy as np

from gcn_tpu.config import ModelConfig


def params_to_torch_state(params: dict, cfg: ModelConfig) -> dict:
    p = params["params"]
    out: dict[str, np.ndarray] = {}

    def npy(x):
        return np.asarray(x)

    if cfg.adj_type == "attention":
        raise ValueError(
            "attention mode has no reference counterpart to export to"
        )
    # the reference registers each embedding twice (GCNRelationModel holds
    # them AND passes the same objects into the GCN submodule,
    # model/gcn.py:57,138), so its state dict has aliased keys
    if not cfg.use_bert_embeddings:
        out["gcn_model.emb.weight"] = npy(p["word_emb"])
        out["gcn_model.gcn.emb.weight"] = out["gcn_model.emb.weight"]
    if cfg.pos_dim > 0:
        out["gcn_model.pos_emb.weight"] = npy(p["pos_emb"])
        out["gcn_model.gcn.pos_emb.weight"] = out["gcn_model.pos_emb.weight"]
    if cfg.ner_dim > 0 and cfg.dataset == "tacred":
        out["gcn_model.ner_emb.weight"] = npy(p["ner_emb"])
        out["gcn_model.gcn.ner_emb.weight"] = out["gcn_model.ner_emb.weight"]
    out["gcn_model.deprel_emb.weight"] = npy(p["deprel_emb"])
    out["gcn_model.gcn.deprel_emb.weight"] = out["gcn_model.deprel_emb.weight"]

    if cfg.rnn:
        rnn = p["rnn"]
        for li in range(cfg.rnn_layers):
            for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
                out[f"gcn_model.gcn.rnn.weight_ih_l{li}{suffix}"] = npy(
                    rnn[f"l{li}_{d}_w_ih"]
                ).T
                out[f"gcn_model.gcn.rnn.weight_hh_l{li}{suffix}"] = npy(
                    rnn[f"l{li}_{d}_w_hh"]
                ).T
                out[f"gcn_model.gcn.rnn.bias_ih_l{li}{suffix}"] = npy(
                    rnn[f"l{li}_{d}_b_ih"]
                )
                out[f"gcn_model.gcn.rnn.bias_hh_l{li}{suffix}"] = npy(
                    rnn[f"l{li}_{d}_b_hh"]
                )

    if cfg.adj_type == "diagonal_deprel":
        out["gcn_model.gcn.preprocessor.weight"] = npy(
            p["preprocessor"]["kernel"]
        ).T
        out["gcn_model.gcn.preprocessor.bias"] = npy(
            p["preprocessor"]["bias"]
        )

    if cfg.adj_type == "regular":
        for l in range(cfg.num_layers):
            out[f"gcn_model.gcn.W.{l}.weight"] = npy(
                p[f"gcn_w{l}_kernel"]
            ).T
            out[f"gcn_model.gcn.W.{l}.bias"] = npy(p[f"gcn_w{l}_bias"])
    elif cfg.adj_type == "full_deprel":
        if not cfg.deprel_shared_w:
            raise ValueError(
                "reference full_deprel has a single shared weight; export "
                "requires deprel_shared_w=True"
            )
        d, h = cfg.deprel_emb_dim, cfg.hidden_dim
        w3 = npy(p["gcn_deprel_w"])          # [D, T, H]
        b2 = npy(p["gcn_deprel_b"])          # [D, H]
        t = w3.shape[1]
        # forward import does weight[D*H, T].reshape(D, T, H) — a pure
        # row-major reinterpretation, so the inverse is the plain reshape
        out["gcn_model.gcn.W.weight"] = w3.reshape(d * h, t)
        out["gcn_model.gcn.W.bias"] = b2.reshape(d * h)

    for i in range(cfg.mlp_layers):
        out[f"gcn_model.out_mlp.{2 * i}.weight"] = npy(
            p[f"mlp{i}"]["kernel"]
        ).T
        out[f"gcn_model.out_mlp.{2 * i}.bias"] = npy(p[f"mlp{i}"]["bias"])
    out["classifier.weight"] = npy(p["classifier"]["kernel"]).T
    out["classifier.bias"] = npy(p["classifier"]["bias"])
    return out
