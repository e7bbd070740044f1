"""Training-trajectory parity: replay the reference's training schedule
(25 steps of CE loss + clip(5.0) + MyAdagrad(0.1 init accumulator) from the
SAME initial weights on the SAME batch) and match the loss curve.

This is the acceptance evidence that the training path — autograd through
every layer, the gradient-clip composition, and the optimizer math — not
just eval-mode inference, reproduces the reference
(fixtures: tools/make_train_parity_goldens.py)."""

import json

import jax
import numpy as np
import optax
import pytest

from gcn_tpu.compat.torch_import import torch_state_to_params
from gcn_tpu.models.gcn import GCNClassifier
from gcn_tpu.train.optim import build_optimizer
from tests.conftest import load_golden
from tests.test_model_parity import golden_to_batch, golden_to_cfg

CASES = ["train_regular", "train_full_rnn", "train_regular_l2"]


@pytest.mark.parametrize("name", CASES)
def test_loss_trajectory_matches_reference(name):
    z = load_golden(f"{name}.npz")
    opt = json.loads(bytes(z["opt"]).decode())
    cfg = golden_to_cfg(opt)
    state = {
        k[len("state."):]: v for k, v in z.items() if k.startswith("state.")
    }
    params = torch_state_to_params(state, cfg)
    batch = golden_to_batch(z, opt["prune_k"])
    batch["labels"] = z["in.labels"].astype(np.int32)
    batch["example_mask"] = np.ones(len(batch["labels"]), bool)

    model = GCNClassifier(cfg)
    tx = build_optimizer("adagrad", float(z["lr"]), max_grad_norm=5.0)
    opt_state = tx.init(params)

    conv_l2 = float(opt.get("conv_l2", 0) or 0)
    pooling_l2 = float(opt.get("pooling_l2", 0) or 0)

    def loss_fn(p):
        logits, pooled = model.apply(p, batch, True)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        )
        loss = ce.mean()
        # the trainer's penalty composition (train.trainer.conv_l2_penalty
        # scope must equal the reference's conv_l2 = ModuleList W only,
        # reference model/gcn.py:180-184 + model/trainer.py:96-100)
        if conv_l2 > 0:
            from gcn_tpu.train.trainer import conv_l2_penalty

            loss = loss + conv_l2 * conv_l2_penalty(p, cfg.adj_type)
        if pooling_l2 > 0:
            import jax.numpy as jnp

            loss = loss + pooling_l2 * jnp.square(pooled).sum(1).mean()
        return loss

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    ref_losses = z["losses"]
    losses = []
    p, o = params, opt_state
    for _ in range(len(ref_losses)):
        p, o, loss = step(p, o)
        losses.append(float(loss))

    # Step-0 loss is pure forward parity; the first 15 steps pin the
    # backward + clip + Adagrad composition.  Past that, float32 rounding
    # amplifies chaotically once the loss enters its steep region (both
    # curves plunge identically, micro-step apart), so the tail is checked
    # for training QUALITY (same convergence level), not bit-tracking.
    assert abs(losses[0] - ref_losses[0]) < 2e-5, (losses[0], ref_losses[0])
    np.testing.assert_allclose(losses[:15], ref_losses[:15],
                               rtol=5e-3, atol=2e-3)
    assert abs(losses[-1] - ref_losses[-1]) < 0.25, (
        losses[-1], ref_losses[-1],
    )
    assert losses[-1] < losses[0] * 0.6  # trained, not stalled
