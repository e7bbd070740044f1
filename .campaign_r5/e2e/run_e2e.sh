#!/bin/bash
# TACRED-scale end-to-end artifact (VERDICT item 8): full flagship CLI
# run on a 68k-example hard-task corpus on the real chip, with a
# mid-run SIGKILL + --resume exercised, to dev plateau.
set -x
cd /root/repo
D=.campaign_r5/e2e
if [ ! -f $D/.staged ]; then
  python tools/make_sample_data.py --out $D --n 68124 --task hard --seed 5
  touch $D/.staged
fi
FLAGS="--data_dir $D/tacred --vocab_dir $D/vocab --id e2e \
  --model_save_dir $D/models --seed 0 --prune_k 1 --lr 0.3 \
  --rnn_hidden 200 --num_epoch 100 --pooling max --mlp_layers 2 \
  --pooling_l2 0.003 --word_dropout 0.04 --emb_dropout 0.0 \
  --deprel_emb_dim 50 --adj_type full_deprel --batch_size 50 \
  --compute_dtype bfloat16 --steps_per_dispatch 8 --save_steps 400 \
  --eval_batch_size 200"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_tpu_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
# phase 1: train until killed mid-epoch-15-ish
python train.py $FLAGS > $D/phase1.out 2>&1 &
PID=$!
# kill once logs.txt shows epoch 15 (mid-run, between step checkpoints)
for i in $(seq 1 600); do
  sleep 5
  if grep -q "^15	" $D/models/e2e/logs.txt 2>/dev/null; then break; fi
  kill -0 $PID 2>/dev/null || break
done
sleep 7   # land inside epoch 16, between save_steps checkpoints
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
echo "KILLED-AT: $(date -u +%T)" >> $D/phase1.out
# phase 2: elastic resume to completion
python train.py $FLAGS --resume > $D/phase2.out 2>&1
echo E2E_DONE
