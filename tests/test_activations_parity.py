"""Per-layer intermediate-activation parity vs the reference
(fixtures from tools/make_goldens_activations.py: forward hooks on the
reference's in_drop/rnn_drop/gcn_drop — the layer boundaries of
``model/gcn.py:229-393``).  Localizes regressions to a specific stage
instead of a whole-model logit diff."""

import json

import numpy as np
import pytest

from gcn_tpu.compat.torch_import import torch_state_to_params
from gcn_tpu.models.gcn import GCNClassifier
from tests.conftest import load_golden
from tests.test_model_parity import golden_to_batch, golden_to_cfg

CASES = ["act_regular_rnn", "act_full_rnn", "act_diagonal"]


@pytest.mark.parametrize("name", CASES)
def test_intermediate_activations_match(name):
    z = load_golden(f"{name}.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    batch = golden_to_batch(z, opt["prune_k"])
    model = GCNClassifier(cfg)
    (logits, _), aux = model.apply(
        params, batch, True, mutable=["intermediates"]
    )
    inter = aux["intermediates"]

    def ours(tag):
        # sow appends a tuple per call in call order
        return [np.asarray(v) for v in inter[tag]]

    def theirs(tag):
        vals = []
        i = 0
        while f"act.{tag}.{i}" in z:
            vals.append(z[f"act.{tag}.{i}"])
            i += 1
        return vals

    for tag in ("in_drop", "rnn_drop", "gcn_drop"):
        ref = theirs(tag)
        if not ref:
            assert tag == "rnn_drop" and not opt["rnn"]
            continue
        got = ours(tag)
        assert len(got) == len(ref), (tag, len(got), len(ref))
        for li, (a, b) in enumerate(zip(got, ref)):
            # reference activations only matter on real tokens: padded
            # positions differ by construction (the reference trims to the
            # true batch max and zero-fills via packed LSTM semantics)
            nb = b.shape[1]
            np.testing.assert_allclose(
                a[:, :nb], b, atol=5e-5, rtol=1e-4,
                err_msg=f"{name}:{tag}[{li}]",
            )

    np.testing.assert_allclose(
        np.asarray(logits), z["out.logits"], atol=2e-5, rtol=1e-4
    )
