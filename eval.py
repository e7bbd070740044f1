"""Evaluate a trained checkpoint on a TACRED/SemEval split.

Counterpart of the reference ``eval.py``: loads config + weights + the
vocabulary snapshotted into the run directory, scores with the official
micro-F1 scorer, and dumps misclassified examples.

    python eval.py saved_models/00 --dataset test
"""

import argparse
import json
import os

import numpy as np

from gcn_tpu.config import Config
from gcn_tpu.data.dataset import Batcher, RelationDataset, constants_for
from gcn_tpu.data.vocab import Vocab
from gcn_tpu.train import scorer
from gcn_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_dir", help="Run directory, e.g. saved_models/00")
    p.add_argument("--model", default="best_model",
                   help="Checkpoint name inside the run directory.")
    p.add_argument("--data_dir", default=None,
                   help="Override the dataset directory from the config.")
    p.add_argument("--dataset", default="test",
                   help="Split to evaluate: train/dev/test.")
    p.add_argument("--out", default="",
                   help="Optional path to dump predicted labels, one per line.")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = Config.load(os.path.join(args.model_dir, "config.json"))
    if args.data_dir:
        cfg.data.data_dir = args.data_dir
    C = constants_for(cfg.model.dataset)

    vocab = Vocab.load(os.path.join(args.model_dir, "vocab.pkl"))
    assert vocab.size == cfg.model.vocab_size, (
        f"Vocab size {vocab.size} != saved config {cfg.model.vocab_size}"
    )

    trainer = Trainer(cfg)
    meta = trainer.load(os.path.join(args.model_dir, args.model),
                        load_opt_state=False)
    print(f"Loaded checkpoint (epoch {meta.get('epoch')}) from "
          f"{args.model_dir}/{args.model}")

    data_file = os.path.join(cfg.data.data_dir, f"{args.dataset}.json")
    ds = RelationDataset(data_file, cfg, vocab, evaluation=True)
    batcher = Batcher(ds, cfg.train.batch_size, evaluation=True)

    preds, probs, loss = trainer.evaluate(batcher)
    id2label = {v: k for k, v in C.LABEL_TO_ID.items()}
    labels = [id2label[pr] for pr in preds]

    gold = np.array(batcher.gold())
    wrong = [ds.raw_data[batcher.order[i]]
             for i in np.nonzero(np.array(labels) != gold)[0]]
    wrong_path = os.path.join(args.model_dir,
                              f"{args.dataset}_incorrect_data.json")
    with open(wrong_path, "w") as f:
        json.dump(wrong, f)
    print(f"{len(wrong)} misclassified examples dumped to {wrong_path}")

    p_, r_, f1 = scorer.score(
        batcher.gold(), labels, verbose=True,
        negative_label=(cfg.train.scorer_negative_label
                        or C.NEGATIVE_LABEL))
    print(f"{args.dataset} set evaluate result: {p_:.2f}\t{r_:.2f}\t{f1:.2f}")

    if args.out:
        with open(args.out, "w") as f:
            for lab in labels:
                print(lab, file=f)
        print(f"Predictions saved to {args.out}")
    print("Evaluation ended.")


if __name__ == "__main__":
    main()
