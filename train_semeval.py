"""Train a GCN/C-GCN model on SemEval-2010 Task 8.

Counterpart of the reference ``train_semeval.py``: no NER features, 10-class
label set, and — matching the reference's selection policy
(``train_semeval.py:256-262``) — the best model is chosen on train F1 when
no dev split exists.
"""

import pickle

from gcn_tpu.train.cli import args_to_config, build_parser, maybe_force_cpu
from gcn_tpu.train.driver import run_training


def main():
    parser = build_parser(dataset="semeval")
    parser.set_defaults(
        data_dir="dataset/semeval", vocab_dir="dataset/vocab_semeval",
        ner_dim=0,
    )
    args = parser.parse_args()
    maybe_force_cpu(args)
    cfg = args_to_config(args)

    bert_embeddings = None
    if args.use_bert_embeddings and args.bert_embeddings_file:
        with open(args.bert_embeddings_file, "rb") as f:
            bert_embeddings = pickle.load(f)

    result = run_training(cfg, bert_embeddings=bert_embeddings,
                          profile_dir=args.profile_dir or None,
                          resume=args.resume)
    print("Final test metrics at best:", result["test_at_best_dev"])


if __name__ == "__main__":
    main()
