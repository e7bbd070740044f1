"""Vocabulary-difference analysis between training data and misclassified
examples.

Counterpart of the reference analysis script ``data/oov.py``: compares the
verb (or all-token) vocabulary of the training set against the examples a
trained model misclassified (the ``*_incorrect_data.json`` dumps written by
the train/eval drivers), surfacing words the model never saw in training.

    python tools/oov_analysis.py dataset/tacred/train.json \
        saved_models/00/test_incorrect_data.json --pos_prefix VB
"""

from __future__ import annotations

import argparse
import collections
import json


def harvest(path: str, pos_prefix: str | None):
    with open(path) as f:
        data = json.load(f)
    counter: collections.Counter = collections.Counter()
    for ex in data:
        tokens = ex["token"]
        tags = ex.get("stanford_pos", [""] * len(tokens))
        for tok, tag in zip(tokens, tags):
            if pos_prefix is None or tag.startswith(pos_prefix):
                counter[tok.lower()] += 1
    return counter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("train_file")
    p.add_argument("misclassified_file")
    p.add_argument("--pos_prefix", default="VB",
                   help="restrict to tokens whose POS starts with this "
                        "(default verbs); pass '' for all tokens")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()
    prefix = args.pos_prefix or None

    train_vocab = harvest(args.train_file, prefix)
    wrong_vocab = harvest(args.misclassified_file, prefix)

    unseen = {w: c for w, c in wrong_vocab.items() if w not in train_vocab}
    print(f"train vocab ({prefix or 'all'}): {len(train_vocab)} types; "
          f"misclassified vocab: {len(wrong_vocab)} types; "
          f"unseen in train: {len(unseen)} types")
    print("\nMost frequent misclassified-only tokens:")
    for w, c in collections.Counter(unseen).most_common(args.top):
        print(f"  {w:<24} {c}")


if __name__ == "__main__":
    main()
