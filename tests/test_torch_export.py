"""Round-trip compat: golden torch state → params → torch state must be
identical, and exported states load into the reference architecture's
expected key set."""

import json

import numpy as np
import pytest

from gcn_tpu.compat.torch_export import params_to_torch_state
from gcn_tpu.compat.torch_import import torch_state_to_params
from gcn_tpu.config import ModelConfig
from tests.conftest import load_golden
from tests.test_model_parity import golden_to_cfg


@pytest.mark.parametrize(
    "case", ["regular_nornn", "regular_rnn", "diagonal_nornn", "full_rnn"]
)
def test_roundtrip_identity(case):
    z = load_golden(f"model_{case}.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    back = params_to_torch_state(params, cfg)
    assert set(back) == set(state), (
        set(state) - set(back), set(back) - set(state)
    )
    for key in state:
        np.testing.assert_array_equal(back[key], state[key], err_msg=key)


def test_attention_not_exportable():
    cfg = ModelConfig(adj_type="attention")
    with pytest.raises(ValueError, match="no reference counterpart"):
        params_to_torch_state({"params": {}}, cfg)


def test_per_layer_full_deprel_not_exportable():
    cfg = ModelConfig(adj_type="full_deprel", deprel_shared_w=False,
                      rnn=False, pos_dim=0, ner_dim=0,
                      use_bert_embeddings=True)
    params = {"params": {"deprel_emb": np.zeros((85, 4))}}
    with pytest.raises(ValueError, match="shared"):
        params_to_torch_state(params, cfg)


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference"),
    reason="reference repo not mounted",
)
def test_exported_weights_run_in_reference_model():
    """Full circle: our randomly-initialized model's weights, exported to a
    torch state dict, loaded into the actual reference implementation, must
    produce our logits."""
    import sys

    import jax

    sys.path.insert(0, "/root/reference")
    import torch

    from gcn_tpu.models.gcn import GCNClassifier as OurModel
    from tests.test_model_parity import golden_to_batch

    z = load_golden("model_regular_rnn.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    batch = golden_to_batch(z, opt["prune_k"])

    # fresh random init on OUR side
    model = OurModel(cfg)
    params = model.init(
        {"params": jax.random.key(42), "dropout": jax.random.key(1)},
        batch, True,
    )
    ours, _ = model.apply(params, batch, True)

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state(params, cfg).items()
    }
    from model.gcn import GCNClassifier as RefModel

    ref = RefModel(opt)
    ref.load_state_dict(state)
    ref.eval()
    t = lambda key, dt=torch.long: torch.from_numpy(  # noqa: E731
        np.asarray(z[f"in.{key}"])
    )
    inputs = (t("words"), torch.from_numpy(z["in.masks"]), t("pos"),
              t("ner"), t("deprel"), t("head"), t("subj_pos"), t("obj_pos"))
    with torch.no_grad():
        theirs, _ = ref(inputs)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-5, rtol=1e-4
    )
