#!/bin/bash
cd /root/repo
W=.campaign_r5/flagship/seed29
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_tpu_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
BASE="--data_dir $W/data --vocab_dir $W/vocab --num_epoch 80 --batch_size 10 \
 --optim adam --lr 0.2 --decay_epoch 81 --prune_k 1 --num_layers 2 \
 --hidden_dim 64 --rnn_hidden 32 --adj_type full_deprel --deprel_emb_dim 16 \
 --word_dropout 0.04 --eval_batch_size 100"
# (a) same data + config, DIFFERENT train seed: luck vs systematic
timeout 3000 python train.py $BASE --seed 30 --id rng30 \
  --model_save_dir $W/followup > $W/followup_rng30.out 2>&1
# (b) same seed, gcn_dropout off: is the dropout interaction the brake
timeout 3000 python train.py $BASE --seed 29 --gcn_dropout 0 --id nogcndrop \
  --model_save_dir $W/followup > $W/followup_nogcndrop.out 2>&1
# (c) reference diag to 20 epochs (CPU largely free now)
timeout 3000 python tools/liftoff_diag.py --framework reference \
  --workdir $W --seed 29 --epochs 20 \
  --out .campaign_r5/liftoff/base_reference_s29_full.jsonl > /dev/null 2>&1
echo FOLLOWUP_DONE
