"""End-to-end model parity: eval-mode logits vs the reference PyTorch model
(weights + inputs + outputs captured in tests/goldens/model_*.npz by
tools/make_goldens.py).

Covers every aggregation mode, RNN on/off, stacked RNN, no_adj ablation,
all three pooling kinds, deprel_max_depth and directed variants — the
BASELINE.md "per-layer allclose" acceptance gate at the whole-model level.
"""

import json

import numpy as np
import pytest

from gcn_tpu.compat.torch_import import torch_state_to_params
from gcn_tpu.config import ModelConfig
from gcn_tpu.graph.prune import prune_graph
from gcn_tpu.models.gcn import GCNClassifier
from tests.conftest import load_golden

CASES = [
    "l1_regular",
    "l1_diagonal",
    "l1_full",
    "l3_regular",
    "regular_nornn",
    "regular_rnn",
    "diagonal_nornn",
    "full_rnn",
    "full_rnn_depth0",
    "full_rnn_directed",
    "regular_noadj",
    "regular_avg",
    "regular_sum",
    "regular_rnn2l",
]


def test_bert_input_branch_matches_reference():
    """Float precomputed-embedding inputs (reference model/gcn.py:235-236)."""
    z = load_golden("model_bert_rnn.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    cfg.use_bert_embeddings = True
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    batch = golden_to_batch(z, opt["prune_k"])
    batch["words"] = z["in.words"]  # float [B,N,emb_dim]
    model = GCNClassifier(cfg)
    logits, pooled = model.apply(params, batch, True)
    np.testing.assert_allclose(
        np.asarray(logits), z["out.logits"], atol=2e-5, rtol=1e-4
    )


def golden_to_cfg(opt: dict) -> ModelConfig:
    return ModelConfig(
        emb_dim=opt["emb_dim"], ner_dim=opt["ner_dim"], pos_dim=opt["pos_dim"],
        vocab_size=opt["vocab_size"], hidden_dim=opt["hidden_dim"],
        num_layers=opt["num_layers"], input_dropout=0.0, gcn_dropout=0.0,
        rnn=opt["rnn"], rnn_hidden=opt["rnn_hidden"],
        rnn_layers=opt["rnn_layers"], rnn_dropout=0.0,
        prune_k=opt["prune_k"], adj_type=opt["adj_type"],
        deprel_emb_dim=opt["deprel_emb_dim"],
        deprel_self_loop=opt["deprel_self_loop"],
        deprel_directed=opt["deprel_directed"],
        deprel_max_depth=opt["deprel_max_depth"], no_adj=opt["no_adj"],
        pooling=opt["pooling"], mlp_layers=opt["mlp_layers"],
        num_class=opt["num_class"], dataset=opt["dataset"],
        deprel_shared_w=(opt["adj_type"] == "full_deprel"),
        compute_dtype="float32",
    )


def golden_to_batch(z: dict, prune_k: int) -> dict:
    if z["in.words"].ndim == 3:  # BERT float inputs
        words = z["in.words"].astype(np.float32)
    else:
        words = z["in.words"].astype(np.int32)
    masks = z["in.masks"]
    b, n = masks.shape
    lengths = (~masks).sum(1).astype(np.int32)
    e_cap = n
    edge_parent = np.zeros((b, e_cap), np.int32)
    edge_child = np.zeros((b, e_cap), np.int32)
    edge_deprel = np.zeros((b, e_cap), np.int32)
    edge_mask = np.zeros((b, e_cap), bool)
    for i in range(b):
        g = prune_graph(
            z["in.head"][i], z["in.deprel"][i], int(lengths[i]), prune_k,
            z["in.subj_pos"][i], z["in.obj_pos"][i],
        )
        ne = g.num_edges
        edge_parent[i, :ne] = g.edge_parent
        edge_child[i, :ne] = g.edge_child
        edge_deprel[i, :ne] = g.edge_deprel
        edge_mask[i, :ne] = True
    return dict(
        words=words,
        pos=z["in.pos"].astype(np.int32),
        ner=z["in.ner"].astype(np.int32),
        deprel=z["in.deprel"].astype(np.int32),
        subj_mask=z["in.subj_pos"] == 0,
        obj_mask=z["in.obj_pos"] == 0,
        pad_mask=masks,
        lengths=lengths,
        edge_parent=edge_parent,
        edge_child=edge_child,
        edge_deprel=edge_deprel,
        edge_mask=edge_mask,
    )


@pytest.mark.parametrize(
    "case",
    ["regular_nornn", "regular_rnn", "diagonal_nornn", "full_rnn",
     "full_rnn_directed", "full_rnn_depth0"],
)
def test_pallas_fused_path_matches_reference(case):
    """The fused Pallas SpMM path must reproduce the reference logits too
    (interpret mode on CPU)."""
    z = load_golden(f"model_{case}.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    cfg.use_pallas = True
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    batch = golden_to_batch(z, opt["prune_k"])
    model = GCNClassifier(cfg)
    logits, _ = model.apply(params, batch, True)
    np.testing.assert_allclose(
        np.asarray(logits), z["out.logits"], atol=2e-5, rtol=1e-4,
        err_msg=f"{case}: pallas-path logits mismatch",
    )


@pytest.mark.parametrize("case", CASES)
def test_model_matches_reference(case):
    z = load_golden(f"model_{case}.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    batch = golden_to_batch(z, opt["prune_k"])
    model = GCNClassifier(cfg)
    logits, pooled = model.apply(params, batch, True)
    np.testing.assert_allclose(
        np.asarray(pooled), z["out.pooled"], atol=2e-5, rtol=1e-4,
        err_msg=f"{case}: pooled mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(logits), z["out.logits"], atol=2e-5, rtol=1e-4,
        err_msg=f"{case}: logits mismatch",
    )
