"""Train a GCN/C-GCN relation-extraction model on TACRED.

TPU-native counterpart of the reference driver (``/root/reference/train.py``)
with the same flag surface; run e.g.:

    python train.py --id 00 --seed 0 --prune_k 1 --lr 0.3 --no-rnn \
        --num_epoch 100 --pooling max --mlp_layers 2 --pooling_l2 0.003
"""

import pickle

from gcn_tpu.train.cli import args_to_config, build_parser, maybe_force_cpu
from gcn_tpu.train.driver import run_training


def main():
    parser = build_parser(dataset="tacred")
    args = parser.parse_args()
    maybe_force_cpu(args)
    cfg = args_to_config(args)

    bert_embeddings = None
    if args.use_bert_embeddings and args.bert_embeddings_file:
        print(f"Loading BERT embeddings from {args.bert_embeddings_file}...")
        with open(args.bert_embeddings_file, "rb") as f:
            bert_embeddings = pickle.load(f)

    load_from = args.model_file if args.load else None
    result = run_training(cfg, bert_embeddings=bert_embeddings,
                          load_from=load_from,
                          profile_dir=args.profile_dir or None,
                          resume=args.resume)
    print("Final test metrics at best dev:", result["test_at_best_dev"])


if __name__ == "__main__":
    main()
