"""Slow-liftoff diagnostics: per-epoch activation/gradient probes for the
first epochs of a flagship-campaign run, in EITHER framework.

Round-4 left "slow liftoff, not asymptotic gap" as a hypothesis for the
seeds whose dev F1 crawls (design.md §8 item 6 / VERDICT item 2).  This
tool measures the trap-family signals directly, per epoch:

* ``logit_row_var`` — variance of dev logits across classes, averaged
  over examples (0 ⇒ the classifier emits the same row for every input:
  the dead-ReLU collapse signature),
* per-layer alive-ReLU fractions (ours: the model's ``intermediates``
  taps ``gcn_out{l}`` / ``mlp{i}_relu``; reference: forward hooks are
  impractical on its inline F.relu calls, so the per-parameter grad
  norms below carry the same information),
* ``pooled_zero_frac`` — fraction of exactly-zero entries in the pooled
  sentence representation (max-pool of a dead GCN emits exact zeros),
* ``grad_norm/*`` — gradient L2 norms per top-level parameter group on a
  fixed probe batch (zero below the classifier ⇒ permanently trapped;
  merely small ⇒ slow but alive),
* ``train_loss`` for the epoch.

Both sides train EXACTLY like tools/flagship_campaign.py (same flags;
ours: gcn_tpu.train Trainer + Batcher; reference: its own DataLoader +
GCNTrainer with the campaign's opt dict, built by exec'ing the
reference parser head — no reference code is modified).  Stochastic
mechanisms can be ablated per run via the standard flags
(``--word_dropout 0``, ``--input_dropout 0``, ``--gcn_dropout 0``, …)
to isolate which one delays liftoff.

    python tools/liftoff_diag.py --framework ours \
        --workdir .campaign_r5/flagship/seed29 --seed 29 --epochs 15
    python tools/liftoff_diag.py --framework reference ... same

One JSON line per epoch on stdout (and --out file).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def campaign_flags(args):
    """The tools/flagship_campaign.py flag block, minus driver-only bits,
    plus any ablation overrides."""
    return [
        "--data_dir", os.path.join(args.workdir, "data"),
        "--vocab_dir", os.path.join(args.workdir, "vocab"),
        "--num_epoch", str(args.epochs),
        "--batch_size", "10",
        "--optim", "adam", "--lr", "0.2",
        "--decay_epoch", str(args.epochs + 1),
        "--prune_k", "1", "--num_layers", "2",
        "--seed", str(args.seed),
        "--hidden_dim", "64", "--rnn_hidden", "32",
        "--adj_type", args.adj_type,
        "--deprel_emb_dim", "16",
        "--word_dropout", str(args.word_dropout),
        "--input_dropout", str(args.input_dropout),
        "--gcn_dropout", str(args.gcn_dropout),
        "--id", "diag", "--model_save_dir", "/tmp/liftoff_diag_models",
    ]


def _emit(rec, out_fh):
    line = json.dumps(rec)
    print(line, flush=True)
    if out_fh:
        out_fh.write(line + "\n")
        out_fh.flush()


# ---------------------------------------------------------------- ours side
def run_ours(args, out_fh):
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from gcn_tpu.data.dataset import Batcher, RelationDataset
    from gcn_tpu.data.vocab import Vocab
    from gcn_tpu.train.cli import args_to_config, build_parser
    from gcn_tpu.train.driver import load_word_embeddings
    from gcn_tpu.train.trainer import Trainer
    from gcn_tpu.constants import LABEL_TO_ID

    ns = build_parser("tacred").parse_args(campaign_flags(args))
    cfg = args_to_config(ns)
    np.random.seed(cfg.train.seed)
    vocab = Vocab.load(os.path.join(cfg.data.vocab_dir, "vocab.pkl"))
    cfg.model.vocab_size = vocab.size
    cfg.model.num_class = len(LABEL_TO_ID)
    emb = load_word_embeddings(cfg, vocab)
    train_ds = RelationDataset(
        os.path.join(cfg.data.data_dir, cfg.data.train_file), cfg, vocab)
    dev_ds = RelationDataset(
        os.path.join(cfg.data.data_dir, cfg.data.dev_file), cfg, vocab,
        evaluation=True)
    train_b = Batcher(train_ds, cfg.train.batch_size, seed=cfg.train.seed,
                      group_by_length=cfg.data.group_by_length)
    dev_b = Batcher(dev_ds, 50, evaluation=True)
    trainer = Trainer(cfg, emb_matrix=emb)
    probe = next(iter(dev_b))

    @jax.jit
    def probe_fn(params):
        (logits, pooled), inter = trainer.model.apply(
            params, probe, True, mutable=["intermediates"])
        stats = {
            "logit_row_var": jnp.mean(jnp.var(logits, axis=1)),
            "pooled_zero_frac": jnp.mean(pooled == 0.0),
        }
        for k, v in inter["intermediates"].items():
            if k.startswith("gcn_out") or k.startswith("mlp"):
                stats[f"alive/{k}"] = jnp.mean(v[0] > 0)

        def ce(p):
            lg, _ = trainer.model.apply(p, probe, True)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                lg.astype(jnp.float32), probe["labels"]))

        grads = jax.grad(ce)(params)
        for k, v in grads["params"].items():
            stats[f"grad_norm/{k}"] = optax.global_norm(
                jax.tree.map(jnp.asarray, v))
        return stats

    for ep in range(1, args.epochs + 1):
        losses = []
        for batch in train_b:
            losses.append(float(trainer.update(batch)))
        stats = {k: float(v) for k, v in probe_fn(trainer.params).items()}
        _emit({"framework": "ours", "seed": args.seed, "epoch": ep,
               "train_loss": float(np.mean(losses)), **stats}, out_fh)


# ----------------------------------------------------------- reference side
def run_reference(args, out_fh):
    os.chdir(REF)
    sys.path.insert(0, REF)
    import torch

    # Build the reference's opt dict by running its own argparse head with
    # the campaign argv (no reference code modified).
    src = open(os.path.join(REF, "train.py")).read()
    head = src.split("args = parser.parse_args()")[0]
    head += "args = parser.parse_args(_diag_argv)\n"
    ns: dict = {"_diag_argv": campaign_flags(args) + ["--cpu"],
                "__name__": "_ref_head"}
    exec(compile(head, "ref_train_head", "exec"), ns)
    opt = vars(ns["args"])
    opt["cuda"] = False

    torch.manual_seed(opt["seed"])
    np.random.seed(opt["seed"])
    import random
    random.seed(1234)

    from data.loader import DataLoader
    from model.trainer import GCNTrainer
    from utils import constant
    from utils.vocab import Vocab

    opt["num_class"] = len(constant.LABEL_TO_ID)
    vocab = Vocab(opt["vocab_dir"] + "/vocab.pkl", load=True)
    opt["vocab_size"] = vocab.size
    emb_matrix = np.load(opt["vocab_dir"] + "/embedding.npy")
    train_batch = DataLoader(opt["data_dir"] + "/train_0.1.json",
                             opt["batch_size"], opt, vocab,
                             evaluation=False)
    dev_batch = DataLoader(opt["data_dir"] + "/dev.json", 50, opt, vocab,
                           evaluation=True)
    trainer = GCNTrainer(opt, emb_matrix=emb_matrix)
    probe = dev_batch[0]

    def probe_stats():
        model = trainer.model
        model.eval()
        # reference batch layout: batch[:-2] inputs, batch[-2] labels,
        # batch[-1] orig_idx (model/trainer.py unpack_batch)
        inputs = list(probe[:-2])
        labels = probe[-2]
        with torch.no_grad():
            logits, pooling_output = model(inputs)
        stats = {
            "logit_row_var": float(logits.var(dim=1).mean()),
            "pooled_zero_frac": float((pooling_output == 0).float().mean()),
        }
        model.zero_grad()
        model.train()
        logits, _ = model(inputs)
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        groups: dict = {}
        for name, p in model.named_parameters():
            if p.grad is None:
                continue
            g = name.split(".")[0]
            groups[g] = groups.get(g, 0.0) + float(p.grad.norm()) ** 2
        for g, v in groups.items():
            stats[f"grad_norm/{g}"] = v ** 0.5
        model.zero_grad()
        return stats

    # the reference's update() returns the loss TENSOR; its train.py does
    # the backward + gradient-accumulated step (update_gap = 50/batch,
    # reference train.py:209-237) — replicated verbatim
    update_gap = int(50 / opt["batch_size"])
    for ep in range(1, args.epochs + 1):
        losses = []
        trainer.model.train()
        trainer.optimizer.zero_grad()
        for i, batch in enumerate(train_batch):
            loss = trainer.update(batch)
            loss.backward()
            losses.append(loss.item())
            if (i + 1) % update_gap == 0:
                torch.nn.utils.clip_grad_norm_(
                    trainer.model.parameters(), opt["max_grad_norm"])
                trainer.optimizer.step()
                trainer.optimizer.zero_grad()
        torch.nn.utils.clip_grad_norm_(
            trainer.model.parameters(), opt["max_grad_norm"])
        trainer.optimizer.step()
        trainer.optimizer.zero_grad()
        _emit({"framework": "reference", "seed": args.seed, "epoch": ep,
               "train_loss": float(np.mean(losses)), **probe_stats()},
              out_fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--framework", choices=["ours", "reference"],
                    required=True)
    ap.add_argument("--workdir", required=True,
                    help="campaign seed dir with data/ and vocab/")
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--adj_type", default="full_deprel")
    ap.add_argument("--word_dropout", type=float, default=0.04)
    ap.add_argument("--input_dropout", type=float, default=0.5)
    ap.add_argument("--gcn_dropout", type=float, default=0.5)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="ours side only: 'default' keeps the attached "
                    "backend (the TPU chip) — ~20x faster per epoch")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    args.workdir = os.path.abspath(args.workdir)
    out_fh = open(args.out, "a") if args.out else None
    if args.framework == "ours":
        run_ours(args, out_fh)
    else:
        run_reference(args, out_fh)


if __name__ == "__main__":
    main()
