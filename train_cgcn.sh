#!/bin/bash
# C-GCN with full_deprel aggregation (see reference train_cgcn.sh)
SAVE_ID=$1
python train.py --id $SAVE_ID --seed 0 --prune_k 1 --lr 0.3 --rnn_hidden 200 --num_epoch 100 --pooling max --mlp_layers 2 --pooling_l2 0.003 --word_dropout 0.04 --emb_dropout 0.0 --deprel_emb_dim 50 --adj_type full_deprel --batch_size 50
