"""End-to-end training comparison: gcn_tpu vs the executed PyTorch reference.

Trains BOTH frameworks from scratch on the same checked-in data with a
matched configuration (same splits, vocab, GloVe matrix, optimizer,
schedule, batch size) and compares dev-F1 / loss trajectories and the
test-F1-at-best-dev selection — the reference's headline protocol
(reference ``train.py:287-293``).  This is the acceptance evidence that
the full training loop (data → model → autograd → optimizer → scorer →
selection) reaches the reference's quality, complementing the step-level
trajectory parity in ``tests/test_train_parity.py``.

Two data modes:

* ``--data_mode memorize`` (default): the checked-in sample data has
  SYNTHETIC random labels, so held-out F1 is pure noise; the comparable
  quality signal is *learnability* — both frameworks must memorize the
  train split at the same rate.  The staging directory aliases dev/test to
  the train split (and provides the ``train_0.1.json`` filename the
  reference hard-codes, reference ``train.py:159``); "dev F1" reads as
  train-memorization F1.
* ``--data_mode learnable``: generated task whose relation is predictable
  from a trigger token (attached to the object in the tree — survives
  K>=1 pruning) plus the subject entity type, with REAL held-out splits —
  dev/test F1 measures generalization.  Both frameworks run at the same
  effective batch (the reference hard-codes update_gap=int(50/batch)).

On the real TACRED corpus the same tool runs unmodified with genuine
splits.

``--dataset semeval`` runs the SemEval-2010 Task 8 pipeline instead
(reference ``train_semeval.py`` vs ours): no dev split — the reference
selects its best model on TRAIN F1 and reports test-at-best-train
(reference ``train_semeval.py:256-262``), and the learnable task drops
the entity-type feature (SemEval has no NER), so the relation is a pure
function of the trigger token.  Only ``--data_mode learnable`` is
supported for semeval (the checked-in random-label semeval sample adds
nothing over the tacred memorize mode).

    python tools/train_compare.py [--num_epoch 30] [--batch_size 10]
    python tools/train_compare.py --data_mode learnable --num_epoch 40 \
        --batch_size 25 --seeds 7,13,21
    python tools/train_compare.py --dataset semeval --data_mode learnable \
        --num_epoch 40 --batch_size 25 --seeds 7,13,21

Prints one JSON line per framework and a final comparison record.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def read_log(path):
    """Parse the shared TSV log format: epoch, train_loss, dev_loss,
    dev_score, best_dev_score (identical in both frameworks)."""
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) >= 5:
                rows.append({
                    "epoch": int(parts[0]),
                    "train_loss": float(parts[1]),
                    "dev_loss": float(parts[2]),
                    "dev_f1": float(parts[3]),
                    "best_dev_f1": float(parts[4]),
                })
    return rows


def common_flags(args, workdir):
    if args.data_mode in ("learnable", "hard"):
        # the generalization protocol: real held-out splits, the
        # hyperparameters measured to solve the 8-class trigger task
        # (adagrad, no plateau decay, regularization off).  lr 0.2, NOT
        # 0.5: at 0.5 this ReLU net (no normalization, one informative
        # token) falls into a permanent dead-ReLU trap on ~40%% of seeds
        # in EITHER framework - the GCN output collapses, pooling emits
        # exact zeros, mlp0's ReLU dies and upstream grads are 0 forever
        # (diagnosed: logits row-variance 0, all mlp0 activations <= 0,
        # zero grads for every layer below the classifier)
        vocab = "vocab_semeval" if args.dataset == "semeval" else "vocab"
        flags = [
            "--vocab_dir", os.path.join(workdir, vocab),
            "--num_epoch", str(args.num_epoch),
            "--batch_size", str(args.batch_size),
            "--optim", args.optim, "--lr", str(args.lr),
            "--decay_epoch", str(args.num_epoch + 1),
            "--prune_k", "1",
            "--num_layers", "2",
            "--seed", str(args.seed),
        ]
        if args.arch == "cgcn":
            # the flagship stack: BiLSTM contextualization + full_deprel
            # aggregation + the reference's default dropout settings —
            # exercises the recurrent front-end, the deprel bilinear and
            # all stochastic regularizers in BOTH frameworks (dropout
            # masks can't match across frameworks, so per-seed deltas are
            # noisier; judge the multi-seed mean)
            flags += ["--hidden_dim", "64", "--rnn_hidden", "32",
                      "--adj_type", "full_deprel",
                      "--deprel_emb_dim", "16",
                      "--word_dropout", "0.04"]
        else:
            flags += ["--hidden_dim", "64", "--no-rnn",
                      "--adj_type", "regular",
                      "--input_dropout", "0", "--gcn_dropout", "0",
                      "--word_dropout", "0"]
        return flags
    flags = [
        "--vocab_dir", os.path.join(REPO, "dataset", "vocab"),
        "--num_epoch", str(args.num_epoch),
        "--batch_size", str(args.batch_size),
        "--optim", "sgd", "--lr", "1.0",
        "--prune_k", "1",
        "--hidden_dim", "40", "--rnn_hidden", "20",
        "--num_layers", "2",
        "--adj_type", "full_deprel",
        "--seed", str(args.seed),
    ]
    if args.no_dropout:
        flags += ["--input_dropout", "0", "--gcn_dropout", "0",
                  "--rnn_dropout", "0", "--word_dropout", "0"]
    return flags


def stage_data(workdir, args=None):
    data = os.path.join(workdir, "data")
    if os.path.isdir(data):
        return data
    if args is not None and args.data_mode in ("learnable", "hard"):
        # learnable: solvable task with REAL held-out splits (relation =
        # f(trigger token attached to the object, subject entity type));
        # hard: non-saturated variant (shared triggers, trigger dropout,
        # decoys, label noise) that lands at F1 ~0.6-0.8 so the
        # cross-framework delta is measured OFF the ceiling
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "make_sample_data.py"),
             "--out", workdir, "--n", str(args.n_train),
             "--task", args.data_mode,
             "--trigger_copies", str(args.trigger_copies)],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        os.rename(os.path.join(workdir, args.dataset), data)
        if args.dataset == "tacred":
            shutil.copy(os.path.join(data, "train.json"),
                        os.path.join(data, "train_0.1.json"))
        return data
    os.makedirs(data)
    train = os.path.join(REPO, "dataset", "tacred", "train.json")
    for alias in ("train.json", "train_0.1.json", "dev.json",
                  "test.json"):
        shutil.copy(train, os.path.join(data, alias))
    return data


def _driver(args):
    return "train_semeval.py" if args.dataset == "semeval" else "train.py"


def run_reference(args, workdir):
    data = stage_data(workdir, args)
    save = os.path.join(workdir, "ref_models")
    cmd = [
        sys.executable, os.path.join(REF, _driver(args)),
        "--data_dir", data,
        "--model_save_dir", save,
        "--test_save_dir", os.path.join(workdir, "ref_test"),
        "--id", "cmp", "--cpu",
        *common_flags(args, workdir),
    ]
    out = subprocess.run(
        cmd, cwd=REF, capture_output=True, text=True, timeout=5400,
        env={**os.environ, "CUDA_VISIBLE_DEVICES": "",
             "OMP_NUM_THREADS": str(args.ref_threads)},
    )
    if out.returncode != 0:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError("reference training failed")
    rows = read_log(os.path.join(save, "cmp", "logs.txt"))
    if args.dataset == "semeval":
        # reference train_semeval.py:280-282 prints the selection result as
        # "Test Metrics at Best Train | F1: 0.xx | ..." (0-1 scale)
        m = re.findall(r"Test Metrics at Best Train \| F1:\s*([\d.]+)",
                       out.stdout)
        test_f1 = float(m[-1]) if m else None
    else:
        m = re.findall(r"F1\s*\(micro\):\s*([\d.]+)", out.stdout)
        test_f1 = float(m[-1]) / 100.0 if m else None
    return rows, test_f1, out.stdout


def run_ours(args, workdir):
    save = os.path.join(workdir, "tpu_models")
    cmd = [
        sys.executable, os.path.join(REPO, _driver(args)),
        "--data_dir", stage_data(workdir, args),
        "--model_save_dir", save,
        "--id", "cmp",
        *common_flags(args, workdir),
    ]
    env = dict(os.environ)
    if args.ours_platform == "cpu":
        cmd.append("--cpu")
    else:
        # run our side on the real TPU chip (the product target; F1 is
        # hardware-independent and the chip is ~10x this host's CPU) —
        # persistent compile cache so seeds 2..N skip the remote compiles
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, ".jax_tpu_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    if args.dataset == "semeval":
        # score with the reference's metric: its SemEval driver uses the
        # TACRED scorer's literal "no_relation" (never present), so its F1
        # counts "Other" as a positive class
        cmd += ["--scorer_negative_label", "no_relation"]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=5400,
        env=env,
    )
    if out.returncode != 0:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError("gcn_tpu training failed")
    rows = read_log(os.path.join(save, "cmp", "logs.txt"))
    m = re.search(r"'f1':\s*([\d.]+)", out.stdout.splitlines()[-1])
    test_f1 = float(m.group(1)) if m else None
    return rows, test_f1, out.stdout


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--seeds", type=str, default="7",
                   help="comma-separated seeds; multiple seeds emit a "
                        "mean-delta aggregate (dropout-mask sampling "
                        "cannot match across frameworks, so single-seed "
                        "deltas on small data are noise)")
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--keep", action="store_true",
                   help="keep the staging directory")
    p.add_argument("--no_dropout", action="store_true",
                   help="disable all stochastic regularization (isolates "
                        "optimization dynamics from noise semantics)")
    p.add_argument("--data_mode",
                   choices=["memorize", "learnable", "hard"],
                   default="memorize",
                   help="memorize = the checked-in random-label sample "
                        "(dev aliases train; measures optimization); "
                        "learnable = generated trigger task with real "
                        "held-out splits (measures generalization); "
                        "hard = non-saturated variant converging to "
                        "F1 0.6-0.8 in both frameworks, so the delta is "
                        "measured off the ceiling (tacred only)")
    p.add_argument("--dataset", choices=["tacred", "semeval"],
                   default="tacred",
                   help="semeval runs the SemEval-2010 Task 8 pipeline "
                        "(train_semeval.py in both frameworks: no dev "
                        "split, best model on TRAIN F1, "
                        "test-at-best-train); learnable mode only")
    p.add_argument("--arch", choices=["gcn", "cgcn"], default="gcn",
                   help="learnable/hard model stack: gcn = 2-layer GCN, "
                        "no RNN, regularization off (isolates "
                        "optimization); cgcn = flagship BiLSTM + "
                        "full_deprel + default dropout (exercises the "
                        "whole stack; noisier per-seed)")
    p.add_argument("--optim", default="adagrad",
                   help="learnable/hard-protocol optimizer for BOTH "
                        "frameworks (the r3 protocol used adagrad 0.2; "
                        "the flagship/cgcn off-ceiling protocol uses "
                        "adam, whose per-parameter adaptivity latches "
                        "onto the sparse trigger signal through the "
                        "0.5-dropout stack an order of magnitude faster "
                        "- both frameworks use torch-default adam "
                        "hyperparameters, reference torch_utils.py:97)")
    p.add_argument("--lr", type=float, default=0.2,
                   help="learnable/hard-protocol learning rate (ignored "
                        "by adam/adamax in BOTH frameworks - reference "
                        "get_optimizer uses torch defaults there)")
    p.add_argument("--trigger_copies", type=int, default=1,
                   help="hard task: trigger attachment multiplicity "
                        "(make_sample_data --trigger_copies): densifies "
                        "the signal so the heavily-regularized flagship "
                        "stack reaches the 0.3-0.8 band in a tractable "
                        "epoch budget; ceilings (trigger dropout, label "
                        "noise) unchanged")
    p.add_argument("--ours_platform", choices=["cpu", "tpu"],
                   default="cpu",
                   help="tpu = run the gcn_tpu side on the real chip "
                        "(the product target; ~10x this host's CPU, "
                        "F1 is hardware-independent); reference always "
                        "runs on CPU (it has no TPU support)")
    p.add_argument("--ref_threads", type=int, default=2,
                   help="OMP_NUM_THREADS for the torch reference run")
    p.add_argument("--n_train", type=int, default=1200,
                   help="learnable mode: training examples (dev/test get "
                        "half each); 1200 x 40 epochs converges to ~0.93 "
                        "dev F1 (smaller/shorter runs are dominated by "
                        "batch-order variance - the task's signal is one "
                        "trigger token, so this regime is high-variance "
                        "until late convergence)")
    args = p.parse_args()
    if args.dataset == "semeval" and args.data_mode != "learnable":
        p.error("--dataset semeval requires --data_mode learnable")
    if args.data_mode == "hard" and args.dataset != "tacred":
        p.error("--data_mode hard is tacred-only (pair disambiguation "
                "rides the subject entity type)")

    deltas = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        args.seed = seed
        workdir = tempfile.mkdtemp(prefix="train_compare_")
        try:
            ref_rows, ref_test, _ = run_reference(args, workdir)
            tpu_rows, tpu_test, _ = run_ours(args, workdir)
            for name, rows, test_f1 in (("reference", ref_rows, ref_test),
                                        ("gcn_tpu", tpu_rows, tpu_test)):
                print(json.dumps({
                    "framework": name,
                    "seed": seed,
                    "epochs": len(rows),
                    "final_train_loss": (rows[-1]["train_loss"]
                                         if rows else None),
                    "best_dev_f1": max((r["dev_f1"] for r in rows),
                                       default=None),
                    "test_f1_at_best_dev": test_f1,
                    "dev_f1_trajectory": [
                        round(r["dev_f1"], 4) for r in rows
                    ],
                }), flush=True)
            best_ref = max((r["dev_f1"] for r in ref_rows), default=0.0)
            best_tpu = max((r["dev_f1"] for r in tpu_rows), default=0.0)
            deltas.append(best_tpu - best_ref)
            print(json.dumps({
                "record": "comparison",
                "seed": seed,
                "dev_f1_delta_tpu_minus_ref": round(deltas[-1], 4),
            }), flush=True)
        finally:
            if not args.keep:
                shutil.rmtree(workdir, ignore_errors=True)

    mean_delta = sum(deltas) / len(deltas)
    print(json.dumps({
        "record": "aggregate",
        "seeds": args.seeds,
        "mean_dev_f1_delta_tpu_minus_ref": round(mean_delta, 4),
        "tpu_matches_or_beats_reference": mean_delta >= -0.05,
    }))


if __name__ == "__main__":
    main()
